package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.Relational

/** The streamed anomaly finisher must equal q119's batch flags when
  * the same events arrive as micro-batches: per-(type, hour) counts
  * ADD, so neither batching (including an hour SPLIT across batches)
  * nor a crash-replayed batch may move the accumulated rollup.
  */
case class REvent(ts: Timestamp, event_type: String)

class RateAnomalyStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed anomaly flags equal q119 across micro-batches splitting hours") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // THE q119 input relation: the events table's (ts, event_type)
    val evs = Relational.events(spark, dir)
      .select(col("ts"), col("event_type"))
      .as[REvent].collect()
    // split by row parity — most hours land in BOTH batches, the
    // exact case where a per-batch rollup must re-aggregate
    val (b1, b2) = evs.zipWithIndex.partition(_._2 % 2 == 0)
    val parts = Files.createTempDirectory("rate_parts").toString
    val ckpt = Files.createTempDirectory("rate_ckpt").toString
    val in = MemoryStream[REvent]
    val q = RateAnomalyStream.rollupPartials(
      spark, in.toDS().toDF(), parts, ckpt)
    try {
      in.addData(b1.map(_._1).toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(b2.map(_._1).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = RateAnomalyStream.anomalies(spark, parts)
    val batch = Relational.queries("q119_rate_anomaly")(spark, dir)
    assert(streamed.count() > 0, "fixture produced no anomalies to compare")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed anomaly flags diverge from q119's batch flags")
    // the SAME accumulated partials feed the second finisher: q120's
    // trend must also match its batch form exactly
    val streamedTrend = RateAnomalyStream.trends(spark, parts)
    val batchTrend = Relational.queries("q120_rate_trend")(spark, dir)
    assert(batchTrend.count() > 0, "fixture produced no trend rows to compare")
    assert(streamedTrend.exceptAll(batchTrend).isEmpty &&
      batchTrend.exceptAll(streamedTrend).isEmpty,
      "streamed trend fit diverges from q120's batch fit")
  }

  test("a replayed rollup batch overwrites; empty dir reads as empty flags") {
    import spark.implicits._
    val evs = Relational.events(spark, dir)
      .select(col("ts"), col("event_type"))
    val parts = Files.createTempDirectory("rate_replay").toString
    for (_ <- 1 to 2)
      RateAnomalyStream.rollupBatch(evs, parts, batchId = 5)
    val total = RateAnomalyStream.anomalies(spark, parts)
    val batch = Relational.queries("q119_rate_anomaly")(spark, dir)
    assert(total.exceptAll(batch).isEmpty && batch.exceptAll(total).isEmpty,
      "replay double-counted the rollup")
    val empty = RateAnomalyStream.anomalies(spark,
      Files.createTempDirectory("rate_empty").toString)
    assert(empty.count() == 0 && empty.columns.toSeq ==
      Seq("event_type", "hour", "n", "k", "s", "q"))
  }
}
