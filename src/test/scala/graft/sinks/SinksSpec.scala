package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.approach.{AirportIndex, ApproachDetector, ApproachPipeline}
import graft.sources.{Dims, FlightGen}

/** Write-and-read-back tests of the parquet sinks, including the
  * idempotency contract (second write of the same batch leaves the
  * same rows).
  */
class SinksSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("writeApproaches: partitioned parquet, idempotent overwrite") {
    import spark.implicits._
    val out = Files.createTempDirectory("approaches").toString
    val flights = FlightGen.trace(spark.range(4).toDF("flight"))
      .as[graft.model.FlightSample]
    val approaches = ApproachPipeline.detectApproaches(
      flights, Dims.syntheticAirports())
    Sinks.writeApproaches(approaches, out)
    val firstDf = spark.read.parquet(out)
    assert(firstDf.columns.contains("flight_bucket"))
    // materialize before the overwrite invalidates the scanned files
    val firstRows = firstDf.select("flight_id", "approach_id", "landing_type")
      .collect().toSet
    assert(firstRows.size == 4)
    Sinks.writeApproaches(approaches, out) // re-run the same batch
    val secondRows = spark.read.parquet(out)
      .select("flight_id", "approach_id", "landing_type").collect().toSet
    assert(secondRows == firstRows)
  }

  test("mergeApproaches: per-key upsert across two overlapping batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Files.createTempDirectory("merge").toString + "/approaches"
    val flights = FlightGen.trace(spark.range(6).toDF("flight"))
      .as[graft.model.FlightSample]
    val all = ApproachPipeline.approachesTable(
      ApproachPipeline.detectApproaches(flights, Dims.syntheticAirports()))
      .persist()
    // batch 1: flights 0,2,4 with a sentinel; batch 2: flights 0,3
    Sinks.mergeApproachesTable(
      all.filter(col("flight_id") % 2 === 0).withColumn("unstable", lit(9)),
      out, buckets = 4)
    Sinks.mergeApproachesTable(
      all.filter(col("flight_id") % 3 === 0), out, buckets = 4)
    val got = spark.read.parquet(out)
      .select("flight_id", "unstable").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    all.unpersist()
    // keys = {0,2,3,4}; flight 0 updated by batch 2 (sentinel replaced),
    // 2 and 4 survive with the sentinel, 3 inserted by batch 2
    assert(got.keySet == Set(0L, 2L, 3L, 4L))
    assert(got(0L) != 9, "overlap key must take batch-2 values")
    assert(got(2L) == 9 && got(4L) == 9, "non-matched rows must survive")
    // idempotency: re-merging batch 2 changes nothing
    Sinks.mergeApproachesTable(
      ApproachPipeline.approachesTable(
        ApproachPipeline.detectApproaches(flights, Dims.syntheticAirports()))
        .filter(col("flight_id") % 3 === 0), out, buckets = 4)
    val again = spark.read.parquet(out)
      .select("flight_id", "unstable").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got)
  }

  test("commitFlightAnalysis: flags follow the merge; replay converges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Files.createTempDirectory("commit").toString
    val (apPath, flagPath) = (s"$base/approaches", s"$base/flags")
    val flights = FlightGen.trace(spark.range(3).toDF("flight"))
      .as[graft.model.FlightSample].toDF()
    val batch = ApproachPipeline.approachesTable(
      ApproachPipeline.detectApproaches(
        flights.as[graft.model.FlightSample], Dims.syntheticAirports()))
    Sinks.commitFlightAnalysis(batch, flights, apPath, flagPath, buckets = 4)
    val aps = spark.read.parquet(apPath)
      .select("flight_id").collect().map(_.getLong(0)).toSet
    val flags = spark.read.parquet(flagPath)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(aps == Set(0L, 1L, 2L))
    assert(flags == Map(0L -> 1, 1L -> 1, 2L -> 1))
    // crash-replay contract: a flight whose flag write was lost gets
    // re-run; the repeated commit upserts identical rows and the end
    // state is unchanged (at-least-once run, exactly-once state)
    Sinks.commitFlightAnalysis(batch, flights, apPath, flagPath, buckets = 4)
    val aps2 = spark.read.parquet(apPath)
      .select("flight_id", "approach_id", "landing_type").collect().toSet
    assert(aps2.map(_.getLong(0)) == Set(0L, 1L, 2L))
    assert(spark.read.parquet(flagPath).count() == 3)
  }

  test("flightValidity: zero/NULL positions invalid, any usable sample valid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Seq(
      (1L, 0.0, Option.empty[Double]), // invalid: lat 0, lon NULL
      (1L, 0.0, Option.empty[Double]),
      (2L, 0.0, Option.empty[Double]),
      (2L, 40.1, Some(-100.0)), // one usable sample -> valid
      (3L, 0.0, Some(0.0)) // both exactly 0 -> invalid
    ).toDF("flight", "latitude", "longitude")
    val got = ApproachPipeline.flightValidity(samples)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("mergeStream: streamed micro-batches upsert like the batch merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Files.createTempDirectory("mergestream").toString + "/approaches"
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Int)]
    val q = Sinks.mergeStream(
      in.toDF().toDF("flight_id", "approach_id", "unstable"),
      out, buckets = 4).start()
    try {
      // micro-batch 1: flights 0,2 with a sentinel value
      in.addData((0L, 1L, 9), (2L, 1L, 9))
      q.processAllAvailable()
      // micro-batch 2: flight 0 updated, flight 3 inserted
      in.addData((0L, 1L, 1), (3L, 1L, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select("flight_id", "unstable").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 1, 2L -> 9, 3L -> 1),
      "stream merge must upsert overlap keys and keep non-matched rows")
  }

  test("printApproaches: console sink renders without throwing (S8)") {
    import spark.implicits._
    Sinks.printApproaches(Seq((1L, "AP01")).toDF("flight_id", "airport_id"), 5)
  }

  test("analysisFlags: every distinct flight flagged once") {
    import spark.implicits._
    val flights = FlightGen.trace(spark.range(3).toDF("flight"))
    val flags = Sinks.analysisFlags(flights)
    val rows = flags.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Int]("approach_analysis") == 1))
  }
}
