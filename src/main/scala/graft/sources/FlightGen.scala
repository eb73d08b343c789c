package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.FlightSample

/** Deterministic synthetic flight-trace generator over the driver
  * testdata (TESTDATA.md): one 600-sample, 1 Hz flight per distinct
  * `events.user_id`, flown between two airports of
  * [[Dims.syntheticAirports]]. Pure column arithmetic — codegen'd,
  * no UDFs, scales linearly with the number of users.
  *
  * The profile is designed to drive every phase predicate of the
  * reference state machine (FlightAnalysis.py:150,163,187,287):
  * ground -> climb through 500 ft AGL -> cruise -> descent into the
  * destination's 1 mi / 500 ft gate -> 150..50 ft final window ->
  * one of three landing flavors (flight%3): stop-and-go,
  * touch-and-go, go-around. Flights divisible by 5/7/11/13 violate
  * the A/S/F1/F2 stability conditions respectively.
  */
object FlightGen {

  val SamplesPerFlight = 600
  val NumAirports = 8

  /** One flight per distinct events.user_id. */
  def flights(spark: SparkSession, sfDir: String): Dataset[FlightSample] = {
    import spark.implicits._
    // events.ts is TIMESTAMP(NANOS); schema conversion rejects it even
    // for pruned columns unless nanos are read as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val users = spark.read
      .parquet(s"$sfDir/events.parquet")
      .select(col("user_id").as("flight"))
      .distinct()
    trace(users).as[FlightSample]
  }

  /** Adds the nine sensor columns to a (flight) keyed frame. */
  def trace(flightsDf: DataFrame): DataFrame = {
    val base = flightsDf
      .withColumn("time", explode(sequence(lit(0L), lit(SamplesPerFlight - 1L))))

    val f = col("flight")
    val t = col("time").cast("double")

    // airport geometry (mirrors Dims.syntheticAirports)
    val homeK = pmod(f, lit(NumAirports)).cast("double")
    val destK = pmod(f + 1, lit(NumAirports)).cast("double")
    val homeLat = lit(40.0) + homeK
    val homeLon = lit(-100.0) + homeK
    val homeAlt = lit(800.0) + lit(25.0) * homeK
    val destLat = lit(40.0) + destK
    val destLon = lit(-100.0) + destK
    val destAlt = lit(800.0) + lit(25.0) * destK
    // degrees of longitude per statute mile at the destination's latitude
    val degPerMileLon = lit(1.0) / (lit(69.09577) * cos(radians(destLat)))

    val v = pmod(f, lit(3)) // landing flavor

    // ---- altitude AGL relative to dest (t >= 380) ----
    val haglDescent = lit(500.0) - (t - 380) * 8.0 // 380..424
    val haglFinal = lit(148.0) - (t - 424) * 1.8 // 425.. (flavor-dependent end)
    val haglRollout = greatest(lit(0.0), lit(49.0) - (t - 479) * 2.0)
    val haglDest =
      when(t <= 424, haglDescent)
        .when(v === 2,
          when(t <= 460, haglFinal)
            .otherwise(least(lit(3000.0), lit(83.2) + (t - 460) * 10.0)))
        .when(t <= 479, haglFinal)
        .when(v === 1 && t >= 520, least(lit(3000.0), (t - 520) * 50.0))
        .otherwise(haglRollout)

    val msl =
      when(t <= 9, homeAlt)
        .when(t <= 69, homeAlt + (t - 9) * 50.0)
        .when(t <= 299, homeAlt + 3000.0)
        .when(t <= 379,
          (homeAlt + 3000.0) + (t - 300) * ((destAlt + 500.0) - (homeAlt + 3000.0)) / 80.0)
        .otherwise(destAlt + haglDest)

    // ---- position ----
    val ctOff = when(pmod(f, lit(13)) === 0, lit(0.0003)).otherwise(lit(0.0))
    val cruiseP = (t - 100) / 250.0
    val offMiles =
      when(t <= 349, lit(1.2)) // only used from t>=350
        .when(t <= 424, lit(1.2) - (t - 350) * (1.15 / 74.0))
        .otherwise(lit(0.05))
    val lat =
      when(t <= 99, homeLat)
        .when(t <= 349, homeLat + cruiseP * (destLat - homeLat) + ctOff * cruiseP)
        .otherwise(destLat + ctOff)
    val lon =
      when(t <= 99, homeLon)
        .when(t <= 349,
          homeLon + cruiseP * ((destLon - lit(1.2) * degPerMileLon) - homeLon))
        .otherwise(destLon - offMiles * degPerMileLon)

    // ---- instruments ----
    val heading =
      when(pmod(f, lit(11)) === 0 && t.between(448, 452), lit(105.0))
        .otherwise(lit(90.0))
    val ias =
      when(t <= 9, lit(0.0))
        .when(t <= 379, lit(100.0))
        .when(t <= 424, lit(70.0))
        .when(t <= 479,
          when(pmod(f, lit(5)) === 0 && t.between(430, 437), lit(80.0))
            .otherwise(lit(65.0)))
        .otherwise(
          when(v === 0, greatest(lit(25.0), lit(65.0) - (t - 480) * 2.0))
            .when(v === 1, lit(45.0))
            .otherwise(lit(65.0)))
    val vsi =
      when(t <= 9, lit(0.0))
        .when(t <= 69, lit(500.0))
        .when(t <= 299, lit(0.0))
        .when(t <= 479,
          when(pmod(f, lit(7)) === 0 && t.between(440, 445), lit(-1200.0))
            .otherwise(lit(-700.0)))
        .otherwise(lit(0.0))

    base.select(
      f.as("flight"),
      col("time"),
      msl.as("msl_altitude"),
      ias.as("indicated_airspeed"),
      vsi.as("vertical_airspeed"),
      heading.as("heading"),
      lat.as("latitude"),
      lon.as("longitude"),
      lit(3.0).as("pitch_attitude"),
      lit(2400.0).as("eng_1_rpm")
    )
  }
}
