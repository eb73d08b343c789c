package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.approach.ApproachPipeline
import graft.model.Approach
import graft.sources.{Dims, FlightGen}

/** Flagship approach-pipeline queries (SURVEY.md §2.5, reference
  * FlightAnalysis.py:46-330) over the deterministic [[FlightGen]]
  * traces: one 600-sample flight per distinct `events.user_id`, flown
  * into the [[Dims.syntheticAirports]] grid.
  *
  * Oracle strategy: the state machine itself is not SQL-expressible
  * (data-dependent stride-15 scan), but FlightGen's engineered flavors
  * make the *expected output* a closed-form function of the flight id:
  *   - landing flavor  = flight % 3 (0 stop-and-go, 1 touch-and-go,
  *     2 go-around);
  *   - stability violations injected iff flight % 5/7/11/13 == 0
  *     (A / S / F1 / F2 respectively), all inside the final window;
  *   - destination airport = AP{(flight+1) % 8} of the synthetic grid;
  *   - exactly one approach per flight.
  * So DuckDB can compute the expected distribution/flags directly from
  * `SELECT DISTINCT user_id FROM events` — a genuine end-to-end
  * cross-check: if the detector mis-segments a phase or drops a
  * violation, the hash comparison fails.
  */
object ApproachQueries {

  def approaches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ApproachPipeline.approachesTable(
      ApproachPipeline.detectApproaches(
        FlightGen.flights(spark, dir),
        Dims.syntheticAirports()))
  }

  // ---- q20: full 18-column approaches table (rows-only driver check;
  //      golden-tested in ApproachDetectorSpec) ----
  def q20(spark: SparkSession, dir: String): DataFrame =
    approaches(spark, dir).orderBy(col("flight_id"), col("approach_id"))

  // ---- q21: landing-type distribution (W7 labels vs closed form) ----
  def q21(spark: SparkSession, dir: String): DataFrame =
    approaches(spark, dir)
      .groupBy(col("landing_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("landing_type"))

  val q21Sql: String =
    """SELECT CASE CAST(user_id % 3 AS INT)
      |         WHEN 0 THEN 'stop-and-go'
      |         WHEN 1 THEN 'touch-and-go'
      |         ELSE 'go-around' END AS landing_type,
      |  count(*) AS n
      |FROM (SELECT DISTINCT user_id FROM events)
      |GROUP BY 1 ORDER BY landing_type""".stripMargin

  // ---- q22: per-flight stability flags (F6/W5 vs closed form) ----
  def q22(spark: SparkSession, dir: String): DataFrame =
    approaches(spark, dir)
      .select(
        col("flight_id"),
        col("approach_id"),
        col("airport_id"),
        col("unstable"),
        col("f1_heading").isNotNull.cast("int").as("has_f1"),
        col("f2_crosstrack").isNotNull.cast("int").as("has_f2"),
        col("a_ias").isNotNull.cast("int").as("has_a"),
        col("s_vsi").isNotNull.cast("int").as("has_s"))
      .orderBy(col("flight_id"), col("approach_id"))

  val q22Sql: String =
    """SELECT user_id AS flight_id, 1 AS approach_id,
      |  'AP0' || CAST((user_id + 1) % 8 AS INT) AS airport_id,
      |  CAST(user_id % 5 = 0 OR user_id % 7 = 0
      |    OR user_id % 11 = 0 OR user_id % 13 = 0 AS INT) AS unstable,
      |  CAST(user_id % 11 = 0 AS INT) AS has_f1,
      |  CAST(user_id % 13 = 0 AS INT) AS has_f2,
      |  CAST(user_id % 5 = 0 AS INT) AS has_a,
      |  CAST(user_id % 7 = 0 AS INT) AS has_s
      |FROM (SELECT DISTINCT user_id FROM events)
      |ORDER BY flight_id, approach_id""".stripMargin

  // ---- q23: processed-flag sink contents (S7 + A4) ----
  // Every input flight must come out flagged with exactly one
  // detected approach (FlightGen guarantees one per flight) — catches
  // silently dropped flights.
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val flights = graft.sinks.Sinks.analysisFlags(
      FlightGen.flights(spark, dir).toDF())
    val counts = approaches(spark, dir)
      .groupBy(col("flight_id")).agg(count(lit(1)).as("n_approaches"))
    flights.join(counts, Seq("flight_id"), "left")
      .select(col("flight_id"), col("approach_analysis"),
        coalesce(col("n_approaches"), lit(0L)).as("n_approaches"))
      .orderBy(col("flight_id"))
  }

  val q23Sql: String =
    """SELECT user_id AS flight_id, 1 AS approach_analysis,
      |  CAST(1 AS BIGINT) AS n_approaches
      |FROM (SELECT DISTINCT user_id FROM events)
      |ORDER BY flight_id""".stripMargin

  // ---- q24: airport dimension scan over the reference CSVs
  //      (S4 + S5 + J3; main.py:163-183) ----
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val refDir = "/root/reference/data"
    val dim = Dims.airportsWithRunways(
      Dims.loadAirportsCsv(spark, s"$refDir/Airports.csv"),
      Dims.loadRunwaysCsv(spark, s"$refDir/AirportsDetailed.csv"))
    dim.groupBy(col("state"))
      .agg(count(lit(1)).as("n_airports"),
        sum(size(col("runways"))).cast("long").as("n_runways"),
        max(col("alt")).cast("long").as("max_elev_ft"))
      .orderBy(col("state"))
  }

  val q24Sql: String =
    """WITH r AS (
      |  SELECT Airport_Code AS code, count(*) AS nr
      |  FROM read_csv('/root/reference/data/AirportsDetailed.csv', header=true)
      |  GROUP BY 1
      |)
      |SELECT a.State_Code AS state, count(*) AS n_airports,
      |  CAST(coalesce(sum(r.nr), 0) AS BIGINT) AS n_runways,
      |  CAST(max(a.Elevation_FT) AS BIGINT) AS max_elev_ft
      |FROM read_csv('/root/reference/data/Airports.csv', header=true) a
      |LEFT JOIN r ON a.Airport_Code = r.code
      |GROUP BY 1 ORDER BY state""".stripMargin

  // ---- q28: per-aircraft-type thresholds (the reference's dead
  //      setThresholds feature, working) ----
  // PA28 (flight%4==1) tolerates IAS<=85 -> the engineered 80 kt
  // A-violation vanishes; SR20 (flight%4==2) tolerates VSI>=-1300 ->
  // the -1200 fpm S-violation vanishes. Everything else unchanged.
  def q28(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{element_at, array}
    val samples = FlightGen.flights(spark, dir)
    val types = samples.select(col("flight")).distinct()
      .withColumn("aircraft_type",
        element_at(array(lit("C172"), lit("PA28"), lit("SR20"), lit("BE36")),
          (col("flight") % 4 + 1).cast("int")))
    val th = Map(
      "PA28" -> graft.model.Thresholds(approachMaxIas = 85),
      "SR20" -> graft.model.Thresholds(approachMinVsi = -1300))
    ApproachPipeline.approachesTable(
      ApproachPipeline.detectApproachesPerAircraft(
        samples, Dims.syntheticAirports(), types, th))
      .select(
        col("flight_id"),
        col("unstable"),
        col("a_ias").isNotNull.cast("int").as("has_a"),
        col("s_vsi").isNotNull.cast("int").as("has_s"),
        col("f1_heading").isNotNull.cast("int").as("has_f1"),
        col("f2_crosstrack").isNotNull.cast("int").as("has_f2"))
      .orderBy(col("flight_id"))
  }

  val q28Sql: String =
    """SELECT user_id AS flight_id,
      |  CAST((user_id % 5 = 0 AND user_id % 4 <> 1)
      |    OR (user_id % 7 = 0 AND user_id % 4 <> 2)
      |    OR user_id % 11 = 0 OR user_id % 13 = 0 AS INT) AS unstable,
      |  CAST(user_id % 5 = 0 AND user_id % 4 <> 1 AS INT) AS has_a,
      |  CAST(user_id % 7 = 0 AND user_id % 4 <> 2 AS INT) AS has_s,
      |  CAST(user_id % 11 = 0 AS INT) AS has_f1,
      |  CAST(user_id % 13 = 0 AS INT) AS has_f2
      |FROM (SELECT DISTINCT user_id FROM events)
      |ORDER BY flight_id""".stripMargin

  /** All approach queries + oracles, keyed as registered in SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_approaches" -> (q20 _),
    "q21_landing_types" -> (q21 _),
    "q22_stability_flags" -> (q22 _),
    "q23_analysis_flags" -> (q23 _),
    "q24_airport_dims" -> (q24 _),
    "q28_per_aircraft_thresholds" -> (q28 _)
  )

  val oracles: Map[String, String] = Map(
    "q21_landing_types" -> q21Sql,
    "q22_stability_flags" -> q22Sql,
    "q23_analysis_flags" -> q23Sql,
    "q24_airport_dims" -> q24Sql,
    "q28_per_aircraft_thresholds" -> q28Sql
  )
}
