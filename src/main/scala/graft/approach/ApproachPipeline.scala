package graft.approach

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{Airport, Approach, FlightSample, Thresholds}

/** Distributed wrapper of [[ApproachDetector]] — the engine's flagship
  * custom operator (SURVEY.md §2.5, §2.10): behaves like a UDTF, one
  * flight group in, N approach rows out.
  *
  * Physical strategy: exactly ONE shuffle. `repartition(flight)` +
  * `sortWithinPartitions(flight, time)` gives each partition a stream
  * of whole flights in time order (secondary sort); `mapPartitions`
  * then walks runs of equal flight ids. We deliberately do NOT use
  * `groupByKey(_.flight).flatMapGroups` — its lambda key is opaque to
  * Catalyst, so it would add a second full shuffle of the samples and
  * would not preserve the time order established here.
  *
  * The airport dimension is broadcast (reference reaches it via
  * fork copy-on-write, main.py:43,136); each task builds one shared
  * [[AirportIndex]]. Per-flight sample vectors are materialized
  * (bounded: hours of 1 Hz data = <100k samples per flight), matching
  * the reference's per-flight list (main.py:87-97).
  */
object ApproachPipeline {

  def detectApproaches(
      samples: Dataset[FlightSample],
      airports: Array[Airport],
      th: Thresholds = Thresholds()
  ): Dataset[Approach] = {
    val spark = samples.sparkSession
    import spark.implicits._
    val bAirports = spark.sparkContext.broadcast(airports)

    samples
      .repartition(col("flight"))
      .sortWithinPartitions(col("flight"), col("time"))
      .mapPartitions { it =>
        val detector = new ApproachDetector(new AirportIndex(bAirports.value), th)
        groupedRuns(it)(_.flight).flatMap { case (fid, data) =>
          detector.detect(fid, data)
        }
      }
  }

  /** 18-column DataFrame matching the reference's `approaches` sink
    * (FlightAnalysis.py:22-26) — drops the in-memory intervals list.
    */
  def approachesTable(approaches: Dataset[Approach]): DataFrame =
    approaches.drop("unstable_intervals")

  /** F4: flight-validity probe (reference main.py:186-191) — a flight
    * is valid iff ANY sample has a usable position: latitude or
    * longitude neither NULL nor exactly 0. Null-safe by construction
    * (each conjunct leads with isNotNull, so `false AND null` folds to
    * false, never leaking NULL through the OR).
    */
  def flightValidity(samples: DataFrame): DataFrame = {
    val usable =
      (col("latitude").isNotNull && col("latitude") =!= 0) ||
        (col("longitude").isNotNull && col("longitude") =!= 0)
    samples.groupBy(col("flight").as("flight_id"))
      .agg(max(usable.cast("int")).as("valid"))
  }

  // NOT private: encoder codegen instantiates it from generated code
  case class TypedSampleTh(s: FlightSample, th: Option[Thresholds])

  /** Per-aircraft-type exceedance thresholds — the feature the
    * reference intended but never shipped (`setThresholds` assigns to
    * locals and its call site is commented out, FlightAnalysis.py:
    * 52,67-83). Thresholds are a broadcast *dimension table*, the form
    * matching the reference's `exceedance_thresholds` DB read
    * (FlightAnalysis.py:20,71-82): a DataFrame of (aircraft_type,
    * <the 14 [[Thresholds]] columns>), joined onto the type dimension
    * and shipped with each flight's samples as a struct column. (A
    * driver-side Map config folds in trivially —
    * `map.toSeq.toDF("aircraft_type", "th").select($"aircraft_type",
    * $"th.*")` — so no second overload exists for it.) LEFT joins
    * throughout: a flight with no type row, or a type with no
    * thresholds row, is analyzed with `default`, never dropped. At
    * many aircraft types this scales where a driver Map would not
    * (the dimension stays distributed until the broadcast, and
    * Catalyst prunes unused columns).
    */
  def detectApproachesPerAircraft(
      samples: Dataset[FlightSample],
      airports: Array[Airport],
      types: DataFrame, // (flight, aircraft_type)
      thresholds: DataFrame, // (aircraft_type, <Thresholds columns>)
      default: Thresholds = Thresholds()
  ): Dataset[Approach] = {
    val spark = samples.sparkSession
    import spark.implicits._
    val bAirports = spark.sparkContext.broadcast(airports)
    val thFields = implicitly[org.apache.spark.sql.Encoder[Thresholds]]
      .schema.fieldNames
    // dim ⋈ dim first (both small), then one broadcast join onto the
    // fact: each sample row carries its flight's thresholds struct
    val flightTh = types
      .join(broadcast(thresholds), Seq("aircraft_type"), "inner")
      .select(col("flight"),
        struct(thFields.map(col).toIndexedSeq: _*).as("th"))
    samples
      .join(broadcast(flightTh), Seq("flight"), "left")
      .select(struct(samples.columns.map(col).toIndexedSeq: _*).as("s"),
        col("th"))
      .as[TypedSampleTh]
      .repartition(col("s.flight"))
      .sortWithinPartitions(col("s.flight"), col("s.time"))
      .mapPartitions { it =>
        val index = new AirportIndex(bAirports.value)
        groupedRuns(it)(_.s.flight).flatMap { case (fid, data) =>
          val th = data.head.th.getOrElse(default)
          new ApproachDetector(index, th).detect(fid, data.map(_.s))
        }
      }
  }

  /** Lazily groups a sorted iterator into (key, run) pairs without
    * reading past each run's end until it is consumed.
    */
  private[approach] def groupedRuns[T, K](it: Iterator[T])(key: T => K)
      : Iterator[(K, IndexedSeq[T])] =
    new Iterator[(K, IndexedSeq[T])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (K, IndexedSeq[T]) = {
        val k = key(buf.head)
        val run = scala.collection.mutable.ArrayBuffer.empty[T]
        while (buf.hasNext && key(buf.head) == k) run += buf.next()
        (k, run.toIndexedSeq)
      }
    }
}
