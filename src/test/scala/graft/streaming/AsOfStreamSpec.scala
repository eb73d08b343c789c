package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.AsOfJoin
import graft.streaming.AsOfStream.{Event, Mark}

/** The streaming as-of must equal the batch asofJoin on the same
  * data — including a mark that arrives AFTER an event it precedes in
  * event time (the case a naive current-state enrichment gets wrong)
  * — and must drop beyond-watermark stragglers per append semantics.
  */
class AsOfStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("parity with batch asofJoin, out-of-order in-watermark mark included") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evIn = MemoryStream[Event]
    val mkIn = MemoryStream[Mark]
    val q = AsOfStream
      .asofEnrichStream(evIn.toDS(), mkIn.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 events straddling two marks; user 2 markless
      evIn.addData(Event(1, 1, ts(5)), Event(2, 1, ts(10)),
        Event(3, 1, ts(15)), Event(4, 1, ts(25)), Event(5, 2, ts(30)))
      mkIn.addData(Mark(100, 1, ts(10)), Mark(101, 1, ts(20)))
      q.processAllAvailable()
      // batch 2: an OUT-OF-ORDER mark (t=22) arriving after event 4
      // (t=25) was ingested — but within the watermark (wm is now 20),
      // so the not-yet-flushed event 4 must still pick it up
      mkIn.addData(Mark(102, 1, ts(22)))
      q.processAllAvailable()
      // advance the watermark far past every row (sentinel user 999,
      // excluded from the assertions) — two steps so the second batch
      // runs with the first's watermark already applied
      evIn.addData(Event(900, 999, ts(200)))
      q.processAllAvailable()
      evIn.addData(Event(901, 999, ts(300)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("asof_out")
      .filter(col("user_id") =!= 999)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap

    // the batch oracle on the same logical data
    val events = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L),
      (4L, 1L, 25L), (5L, 2L, 30L))
      .toDF("event_id", "user_id", "tsec")
    val marks = Seq((100L, 1L, 10L), (101L, 1L, 20L), (102L, 1L, 22L))
      .toDF("mark_id", "user_id", "tsec")
      .select(col("user_id"), col("tsec"), col("mark_id"))
    val expected = AsOfJoin
      .asofJoin(events, marks, Seq("user_id"), "tsec", Seq("mark_id"))
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    assert(got == expected)
    // the load-bearing case: event 4 (t=25) saw the t=22 mark that
    // arrived a batch after it
    assert(got(4L) == Some(102L))
  }

  test("tolerance variant matches batch asofJoinTolerance (stale matches null out)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evIn = MemoryStream[Event]
    val mkIn = MemoryStream[Mark]
    // tolerance 5s: event@10 age 0 matches, event@15 age 5 matches
    // (inclusive), event@16 age 6 is stale, event@9 precedes the mark
    val q = AsOfStream
      .asofEnrichStreamTolerance(evIn.toDS(), mkIn.toDS(), 5000L, "10 seconds")
      .writeStream.format("memory").queryName("asof_tol")
      .outputMode("append").start()
    try {
      evIn.addData(Event(1, 1, ts(10)), Event(2, 1, ts(15)),
        Event(3, 1, ts(16)), Event(4, 1, ts(9)))
      mkIn.addData(Mark(100, 1, ts(10)))
      q.processAllAvailable()
      evIn.addData(Event(900, 999, ts(200)))
      q.processAllAvailable()
      evIn.addData(Event(901, 999, ts(300)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_tol")
      .filter(col("user_id") === 1).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val events = Seq((1L, 1L, 10L), (2L, 1L, 15L), (3L, 1L, 16L),
      (4L, 1L, 9L)).toDF("event_id", "user_id", "tsec")
    val marks = Seq((100L, 1L, 10L)).toDF("mark_id", "user_id", "tsec")
      .select(col("user_id"), col("tsec"), col("mark_id"))
    val expected = AsOfJoin
      .asofJoinTolerance(events, marks, Seq("user_id"), "tsec",
        Seq("mark_id"), 5L)
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == expected)
    assert(got == Map(1L -> Some(100L), 2L -> Some(100L), 3L -> None,
      4L -> None))
  }

  test("mark-only state re-wakes and is removed once stale under tolerance") {
    // a key whose event stream STOPS must not retain its mark list
    // forever: with a tolerance, the kept below-watermark mark becomes
    // useless once wm - mark.ts > tolerance (every future event's ts
    // exceeds wm), so its state must be removed by the event-time
    // timeout — observable as the state store draining to zero rows
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evIn = MemoryStream[Event]
    val mkIn = MemoryStream[Mark]
    val q = AsOfStream
      .asofEnrichStreamTolerance(evIn.toDS(), mkIn.toDS(), 5000L, "10 seconds")
      .writeStream.format("memory").queryName("asof_prune")
      .outputMode("append").start()
    try {
      // user 2: marks only, no events ever (the churned-key shape)
      mkIn.addData(Mark(100, 2, ts(10)), Mark(101, 2, ts(12)))
      evIn.addData(Event(1, 1, ts(5)))
      q.processAllAvailable()
      // advance the watermark far past mark ts + tolerance; each batch
      // fires due event-time timeouts registered by the previous one
      evIn.addData(Event(900, 999, ts(100)))
      q.processAllAvailable()
      evIn.addData(Event(901, 999, ts(200)))
      q.processAllAvailable()
      evIn.addData(Event(902, 999, ts(300)))
      q.processAllAvailable()
      // exactly ONE state row may remain: the last sentinel's own
      // pending event (its ts exceeds the final watermark, so it is
      // legitimately in flight). User 2's mark-only state must be
      // GONE — pre-fix it was retained forever (2 rows here)
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1,
        s"state store holds $stateRows rows; expected only the " +
          "in-flight sentinel — mark-only state was never pruned " +
          "(the pre-fix leak) or the sentinel accounting changed")
    } finally q.stop()
  }

  test("beyond-watermark stragglers are dropped, emitted rows never rewritten") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evIn = MemoryStream[Event]
    val mkIn = MemoryStream[Mark]
    val q = AsOfStream
      .asofEnrichStream(evIn.toDS(), mkIn.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()
    try {
      evIn.addData(Event(1, 1, ts(5)))
      mkIn.addData(Mark(100, 1, ts(3)))
      q.processAllAvailable()
      // push the watermark far ahead (wm becomes 190 after this batch)
      evIn.addData(Event(900, 999, ts(200)))
      q.processAllAvailable()
      evIn.addData(Event(901, 999, ts(300)))
      q.processAllAvailable()
      val flushed = spark.table("asof_late")
        .filter(col("user_id") === 1).collect()
      assert(flushed.map(_.getLong(0)).toSet == Set(1L))
      // stragglers far below the watermark: a mark that would have
      // changed event 1, and an event older than the horizon — both
      // must be dropped (no new rows, no rewrites)
      mkIn.addData(Mark(999, 1, ts(4)))
      evIn.addData(Event(2, 1, ts(6)))
      q.processAllAvailable()
      evIn.addData(Event(902, 999, ts(400)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_late")
      .filter(col("user_id") === 1).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L),
      "a beyond-watermark event must not be emitted")
    assert(rows.forall(r => r.getLong(3) == 100L),
      "a beyond-watermark mark must not rewrite an emitted event")
  }
}
