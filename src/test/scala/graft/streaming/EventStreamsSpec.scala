package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.EventStreams._

/** Drives the streaming operators through MemoryStream micro-batches,
  * asserting watermark-gated emission (windows/sessions only finalize
  * once the watermark passes them).
  */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  // day-1 base: an event at exactly epoch 0 sits on the initial
  // watermark and is discarded as late
  private val Base = 86400000L
  private def ts(min: Long) = new Timestamp(Base + min * 60000L)

  test("hourlyCounts: windows close only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = hourlyCounts(events).writeStream
      .format("memory").queryName("hourly").outputMode(OutputMode.Append)
      .start()
    try {
      // two events in hour 0, one in hour 1
      in.addData((ts(10), "view", 1.0), (ts(20), "view", 2.0),
        (ts(70), "click", 5.0))
      q.processAllAvailable()
      // watermark = max(event) - 2h is still before hour 0 -> nothing out
      assert(spark.table("hourly").count() == 0)
      // advance event time beyond hour 0 + 2h watermark
      in.addData((ts(200), "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("hourly").collect()
        .map(r => ((r.getAs[Timestamp]("hour").getTime - Base) / 60000,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("sum_value"))).toSet
      assert(closed == Set((0L, "view", 2L, 3.0)))
    } finally q.stop()
  }

  test("intervalJoin: pairs events with in-range marks of the same user only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, Long)]
    val left = lIn.toDF().toDF("user_id", "ts", "event_id")
    val right = rIn.toDF().toDF("user_id", "ts", "mark_id")
    val joined = EventStreams
      .intervalJoin(left, right, lookbackSeconds = 600)
      .selectExpr("event_id", "mark_id")
    val q = joined.writeStream
      .format("memory").queryName("ivj").outputMode(OutputMode.Append)
      .start()
    try {
      // marks: user 1 at t=10min (m1), t=40min (m2); user 2 at t=12min (m3)
      rIn.addData((1L, ts(10), 1L), (1L, ts(40), 2L), (2L, ts(12), 3L))
      // events: user 1 at t=15 (within 10min of m1), t=50 and t=48
      // (within of m2), user 1 at t=25 (m1 is 15min back -> no pair),
      // user 2 at t=13 (pairs m3 only — not user 1's m1)
      lIn.addData((1L, ts(15), 100L), (1L, ts(50), 101L), (1L, ts(48), 102L),
        (1L, ts(25), 103L), (2L, ts(13), 104L))
      q.processAllAvailable()
      val out = spark.table("ivj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((100L, 1L), (101L, 2L), (102L, 2L), (104L, 3L)))
    } finally q.stop()
  }

  test("enrichStream: stream-static dim join is stateless and left-keeps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val dim = Seq((1L, "C172"), (2L, "PA28")).toDF("aircraft_id", "type")
    val enriched = EventStreams.enrichStream(
      in.toDF().toDF("flight_id", "aircraft_id"), dim, Seq("aircraft_id"))
    val q = enriched.writeStream
      .format("memory").queryName("enr").outputMode(OutputMode.Append)
      .start()
    try {
      in.addData((10L, 1L), (11L, 2L), (12L, 99L)) // 99 has no dim row
      q.processAllAvailable()
      val out = spark.table("enr")
        .select("flight_id", "type").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(out == Map(10L -> Some("C172"), 11L -> Some("PA28"),
        12L -> None), "left join must keep unmatched facts with NULL dim")
    } finally q.stop()
  }

  test("dedupDocuments: first doc per digest survives, in-watermark dups drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = dedupDocuments(docs, "2 hours").writeStream
      .format("memory").queryName("deduped").outputMode(OutputMode.Append)
      .start()
    try {
      in.addData((ts(0), 1L, "alpha"), (ts(1), 2L, "alpha"), (ts(2), 3L, "beta"))
      q.processAllAvailable()
      val first = spark.table("deduped").collect()
      assert(first.map(_.getAs[String]("text")).sorted.toSeq == Seq("alpha", "beta"))
      // a later re-ingest of "alpha" within the watermark is dropped
      in.addData((ts(30), 4L, "alpha"), (ts(31), 5L, "gamma"))
      q.processAllAvailable()
      val all = spark.table("deduped").collect()
      assert(all.map(_.getAs[String]("text")).sorted.toSeq ==
        Seq("alpha", "beta", "gamma"))
      assert(!all.exists(_.getAs[Long]("doc_id") == 4L))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; timeout emits the last one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = sessionize(in.toDS(), gapSeconds = 600).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append)
      .start()
    try {
      // user 1: events at 0,5 min (one session), then 30 min (new session)
      in.addData(SessionEvent(1, ts(0), 1.0), SessionEvent(1, ts(5), 2.0),
        SessionEvent(1, ts(30), 4.0))
      q.processAllAvailable()
      val first = spark.table("sessions").as[Session].collect()
      assert(first.map(s => (s.user_id, (s.start.getTime - Base) / 60000,
        (s.end.getTime - Base) / 60000, s.n_events, s.sum_value)).toSet ==
        Set((1L, 0L, 5L, 2L, 3.0)))
      // push the watermark (2h) past 30min + 10min gap -> timeout fires
      in.addData(SessionEvent(2, ts(300), 9.0))
      q.processAllAvailable()
      in.addData(SessionEvent(2, ts(301), 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect()
      assert(all.exists(s => s.user_id == 1 &&
        (s.start.getTime - Base) / 60000 == 30 && s.n_events == 1 && s.sum_value == 4.0))
    } finally q.stop()
  }

  test("sessionize: late in-watermark event extends the session start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = sessionize(in.toDS(), gapSeconds = 600).writeStream
      .format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(SessionEvent(1, ts(60), 1.0))
      q.processAllAvailable()
      // late event 5 min EARLIER, still inside the 2h watermark
      in.addData(SessionEvent(1, ts(55), 2.0))
      q.processAllAvailable()
      // close the session via a far-future event on another key
      in.addData(SessionEvent(2, ts(600), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(2, ts(601), 0.0))
      q.processAllAvailable()
      val s = spark.table("late_sessions").as[Session].collect()
        .filter(_.user_id == 1).head
      // the emitted window must cover BOTH counted events
      assert((s.start.getTime - Base) / 60000 == 55)
      assert((s.end.getTime - Base) / 60000 == 60)
      assert(s.n_events == 2 && s.sum_value == 3.0)
    } finally q.stop()
  }
}
