package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.FlightSample
import graft.sources.{Dims, FlightGen}
import graft.streaming.ApproachStream._

/** Batch/stream parity: feeding a FlightGen trace through the
  * streaming detector must yield exactly the batch result, and only
  * after the watermark declares the flight finished.
  */
class ApproachStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("streamed flight emits the same approach as the batch path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 86400000L
    val samples: Seq[FlightSample] = FlightGen
      .trace(spark.range(3, 4).toDF("flight"))
      .as[FlightSample].collect().sortBy(_.time).toSeq
    def at(s: FlightSample) = TimedSample(new Timestamp(base + s.time * 1000), s)

    val in = MemoryStream[TimedSample]
    val q = detectApproaches(in.toDS(), Dims.syntheticAirports(),
      gapSeconds = 60, watermark = "2 minutes").writeStream
      .format("memory").queryName("stream_approaches")
      .outputMode(OutputMode.Append).start()
    try {
      // first half of the flight: nothing may be emitted yet
      in.addData(samples.take(300).map(at): _*)
      q.processAllAvailable()
      assert(spark.table("stream_approaches").count() == 0)
      // rest of the flight, still within the gap
      in.addData(samples.drop(300).map(at): _*)
      q.processAllAvailable()
      assert(spark.table("stream_approaches").count() == 0)
      // a later event (other flight) pushes the watermark past
      // last-sample + gap -> the buffered flight times out and emits
      val probe = samples.head.copy(flight = 999L)
      in.addData(TimedSample(new Timestamp(base + 3600L * 1000), probe))
      q.processAllAvailable()
      in.addData(TimedSample(new Timestamp(base + 7200L * 1000), probe))
      q.processAllAvailable()
      val got = spark.table("stream_approaches")
        .as[graft.model.Approach].collect().filter(_.flight_id == 3L)
      assert(got.length == 1)
      val a = got.head
      assert(a.airport_id == "AP04" && a.approach_start == 424 &&
        a.approach_end == 479 && a.landing_type == "stop-and-go" &&
        a.unstable == 0)
    } finally q.stop()
  }

  test("streamed detector feeds the incremental upsert sink end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val out = java.nio.file.Files
      .createTempDirectory("streamsink").toString + "/approaches"
    val base = 86400000L
    val samples: Seq[FlightSample] = FlightGen
      .trace(spark.range(3, 4).toDF("flight"))
      .as[FlightSample].collect().sortBy(_.time).toSeq
    def at(s: FlightSample, offMs: Long = 0L) =
      TimedSample(new Timestamp(base + offMs + s.time * 1000), s)
    val probe = samples.head.copy(flight = 999L)

    val in = MemoryStream[TimedSample]
    val approaches = detectApproaches(in.toDS(), Dims.syntheticAirports(),
      gapSeconds = 60, watermark = "2 minutes")
      .drop("unstable_intervals")
    val q = graft.sinks.Sinks.mergeStream(approaches, out, buckets = 4)
      .start()
    try {
      // micro-batches BEFORE the first emission: the sink must treat
      // them as no-ops (not create a schema-less table dir)
      in.addData(samples.map(s => at(s)): _*)
      q.processAllAvailable()
      // watermark pushes -> flight 3 times out, emits, merges
      in.addData(at(probe, 3600L * 1000))
      q.processAllAvailable()
      in.addData(at(probe, 7200L * 1000))
      q.processAllAvailable()
      val first = spark.read.parquet(out)
        .filter(col("flight_id") === 3L).collect()
      assert(first.length == 1, "emitted approach must land in the table")
      // re-stream the same flight later (state was dropped at
      // timeout): the re-emission carries the same (flight_id,
      // approach_id) key, so the merge must REPLACE, not append
      in.addData(samples.map(s => at(s, 10800L * 1000)): _*)
      q.processAllAvailable()
      in.addData(at(probe, 14400L * 1000))
      q.processAllAvailable()
      in.addData(at(probe, 18000L * 1000))
      q.processAllAvailable()
      val again = spark.read.parquet(out)
        .filter(col("flight_id") === 3L)
        .select("flight_id", "approach_id", "landing_type").collect()
      assert(again.length == 1, s"upsert must not duplicate: $again")
      assert(again.head.getString(2) == "stop-and-go")
    } finally q.stop()
  }
}
