package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.Relational
import graft.streaming.FunnelStream.FEvent

/** The streaming funnel must equal the q97 batch funnel on the same
  * data — including events arriving out of event-time order across
  * batches (the case an arrival-order fold gets wrong) — and must
  * emit each user exactly once, on idle timeout.
  */
class FunnelStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val stages = Seq("view", "click", "purchase")

  private def ev(u: Long, t: String, sec: Long): FEvent =
    FEvent(u, t, new Timestamp(sec * 1000), sec * 1000000L)

  test("out-of-order view arriving a batch late still qualifies the click") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[FEvent]
    val q = FunnelStream
      .funnelStream(in.toDS(), stages, idleGapMs = 10000L, "30 seconds")
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append").start()
    try {
      // batch 1: user 1's click+purchase arrive BEFORE the view that
      // qualifies them; user 2 has a click but will never view
      in.addData(ev(1, "click", 60), ev(1, "purchase", 65),
        ev(1, "purchase", 55), ev(2, "click", 40))
      q.processAllAvailable()
      // batch 2: the out-of-order view (t=50 > watermark 65-30=35)
      in.addData(ev(1, "view", 50))
      q.processAllAvailable()
      // advance the watermark far past every row + idle gap (sentinel
      // user 999, excluded from assertions); two steps so the second
      // batch runs with the first's watermark applied
      in.addData(ev(999, "view", 500))
      q.processAllAvailable()
      in.addData(ev(999, "view", 900))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_ooo")
      .filter(col("user_id") =!= 999)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // tv=50; tc=60 (the t=55 purchase precedes tc, only t=65 counts)
    assert(got(1L) == Seq(50000000L, 60000000L, 65000000L))
    // no view: later stages can never qualify
    assert(got(2L) == Seq(-1L, -1L, -1L))
    assert(got.size == 2, "each user emits exactly once")
  }

  test("parity with batch q97 at sf0.01, jittered arrival order") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.01"
    // the SAME µs-truncated event stream q97 reads, arriving in
    // jittered order: each event's arrival rank is its time ±30 min
    // (deterministic hash jitter), so batches interleave out of
    // event-time order while staying inside the 2 h watermark —
    // every row folds, none drop, and the incremental (multi-batch)
    // ripening path is exercised across the chunks
    val evs = Relational.eventsNs(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("arrival",
        col("us") + pmod(xxhash64(col("user_id"), col("us")),
          lit(3600000000L)) - lit(1800000000L))
      .orderBy("arrival")
      .collect()
      .map(r => FEvent(r.getLong(0), r.getString(1),
        new Timestamp(r.getLong(2) / 1000), r.getLong(2)))
    val maxSec = evs.map(_.us / 1000000L).max
    val minSec = evs.map(_.us / 1000000L).min
    val chunks = evs.grouped(math.max(1, evs.length / 4 + 1)).toSeq
    // one funnel per user over the WHOLE table (q97's semantics): the
    // idle gap must exceed the table's time span, or a user's
    // within-table quiet periods would split them into several
    // emissions (and n_users would overcount)
    val gapMs = (maxSec - minSec + 3600) * 1000L

    val in = MemoryStream[FEvent]
    val q = FunnelStream
      .funnelStream(in.toDS(), stages, idleGapMs = gapMs, "2 hours")
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("append").start()
    try {
      chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val flushSec = maxSec + gapMs / 1000 + 100000
      in.addData(ev(999999, "view", flushSec))
      q.processAllAvailable()
      in.addData(ev(999999, "view", flushSec + 100000))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("funnel_parity")
      .filter(col("user_id") =!= 999999)
      .select(col("user_id"),
        col("stage_us")(0).as("tv0"), col("stage_us")(1).as("tc0"),
        col("stage_us")(2).as("tp0"))
      .agg(count(lit(1)).as("n_users"),
        count(when(col("tv0") =!= -1L, 1)).as("n_view"),
        count(when(col("tc0") =!= -1L, 1)).as("n_click_after_view"),
        count(when(col("tp0") =!= -1L, 1)).as("n_purchase_after_click"),
        sum(when(col("tp0") =!= -1L, col("tp0") - col("tv0")))
          .as("sum_conv_us"))
      .collect().head
    val batch = Relational.q97(spark, dir).collect().head
    assert(streamed.getLong(0) == batch.getLong(0), "n_users")
    assert(streamed.getLong(1) == batch.getLong(1), "n_view")
    assert(streamed.getLong(2) == batch.getLong(2), "n_click_after_view")
    assert(streamed.getLong(3) == batch.getLong(3),
      "n_purchase_after_click")
    assert(streamed.getLong(4) == batch.getLong(4), "sum_conv_us")
  }
}
