package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def run(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", Seq("mark_id"))
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
  }

  test("picks the latest right row at or before each left time, per key") {
    // user 1 marks at t=10 (m100) and t=20 (m101)
    val marks = Seq((100L, 1L, 10L), (101L, 1L, 20L))
    val events = Seq(
      (1L, 1L, 5L), // before any mark -> null
      (2L, 1L, 10L), // exactly at mark time -> visible (<=)
      (3L, 1L, 15L), // between marks -> m100
      (4L, 1L, 25L), // after both -> m101
      (5L, 2L, 30L)) // other key, no marks -> null
    assert(run(events, marks) == Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(101L), 5L -> None))
  }

  test("ties on (key, time) among right rows resolve to the greatest payload") {
    val marks = Seq((100L, 1L, 10L), (107L, 1L, 10L), (103L, 1L, 10L))
    val events = Seq((1L, 1L, 10L), (2L, 1L, 50L))
    assert(run(events, marks) == Map(1L -> Some(107L), 2L -> Some(107L)))
  }

  private def runForward(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    AsOfJoin.asofJoinForward(l, r, Seq("user_id"), "ts", Seq("mark_id"))
      .select(col("event_id"), col("asof_next.mark_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
  }

  test("forward: picks the earliest right row at or after each left time") {
    val marks = Seq((100L, 1L, 10L), (101L, 1L, 20L))
    val events = Seq(
      (1L, 1L, 5L),  // before both -> next is m100
      (2L, 1L, 10L), // exactly at mark time -> visible (>=)
      (3L, 1L, 15L), // between -> m101
      (4L, 1L, 25L), // after both -> null
      (5L, 2L, 30L)) // other key, no marks -> null
    assert(runForward(events, marks) == Map(
      1L -> Some(100L), 2L -> Some(100L), 3L -> Some(101L),
      4L -> None, 5L -> None))
  }

  test("forward: equal-time ties resolve to the least payload") {
    val marks = Seq((107L, 1L, 10L), (100L, 1L, 10L), (103L, 1L, 10L))
    val events = Seq((1L, 1L, 10L), (2L, 1L, 5L))
    assert(runForward(events, marks) ==
      Map(1L -> Some(100L), 2L -> Some(100L)))
  }

  test("forward: random sweep matches the brute-force reference") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val events = Seq.fill(60)(
        (rnd.nextLong(1000), rnd.nextLong(4), rnd.nextLong(20)))
        .zipWithIndex.map { case ((_, u, t), i) => (i.toLong, u, t) }
      val marks = Seq.fill(15)(
        (100L + rnd.nextLong(100), rnd.nextLong(4), rnd.nextLong(20)))
      val expected = events.map { case (id, u, t) =>
        val cand = marks.filter(m => m._2 == u && m._3 >= t)
        id -> (if (cand.isEmpty) None
               else Some(cand.minBy(m => (m._3, m._1))._1))
      }.toMap
      assert(runForward(events, marks) == expected)
    }
  }

  test("random sweep matches the brute-force reference") {
    val rnd = new scala.util.Random(42)
    // small key/time domains force heavy collisions: equal-time ties,
    // multiple marks per instant, keys with no marks at all
    for (_ <- 1 to 5) {
      val events = Seq.fill(60)(
        (rnd.nextLong(1000), rnd.nextLong(4), rnd.nextLong(20)))
        .zipWithIndex.map { case ((_, u, t), i) => (i.toLong, u, t) }
      val marks = Seq.fill(15)(
        (100L + rnd.nextLong(100), rnd.nextLong(4), rnd.nextLong(20)))
      val expected = events.map { case (id, u, t) =>
        val cand = marks.filter(m => m._2 == u && m._3 <= t)
        id -> (if (cand.isEmpty) None
               else Some(cand.maxBy(m => (m._3, m._1))._1))
      }.toMap
      assert(run(events, marks) == expected)
    }
  }

  private def runTol(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], tol: Long): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    AsOfJoin.asofJoinTolerance(l, r, Seq("user_id"), "ts", Seq("mark_id"), tol)
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
  }

  test("tolerance: stale matches null out, the boundary is inclusive") {
    val marks = Seq((100L, 1L, 10L))
    val events = Seq(
      (1L, 1L, 10L), // age 0 -> match
      (2L, 1L, 15L), // age 5 = tolerance -> match (inclusive)
      (3L, 1L, 16L), // age 6 > tolerance -> stale
      (4L, 1L, 9L)) // before the mark -> no match at all
    assert(runTol(events, marks, 5L) == Map(
      1L -> Some(100L), 2L -> Some(100L), 3L -> None, 4L -> None))
  }

  test("tolerance: the bound applies to the latest match") {
    // mark at t=10 and t=20; event at t=40: with tolerance 25 the
    // latest mark (t=20, age 20) matches; with tolerance 15 nothing
    // does. (Argmax-then-bound and filter-then-argmax are provably
    // the same here — an older candidate is strictly more stale, so
    // a stale latest implies every candidate is stale; no test can
    // distinguish the two formulations, and the oracle uses the
    // filter-first form for exactly that reason.)
    val marks = Seq((100L, 1L, 10L), (101L, 1L, 20L))
    val events = Seq((1L, 1L, 40L))
    assert(runTol(events, marks, 25L) == Map(1L -> Some(101L)))
    assert(runTol(events, marks, 15L) == Map(1L -> None))
  }

  test("tolerance random sweep matches the brute-force reference") {
    val rnd = new scala.util.Random(7)
    for (tol <- Seq(0L, 3L, 8L)) {
      val events = Seq.fill(60)(
        (rnd.nextLong(1000), rnd.nextLong(4), rnd.nextLong(20)))
        .zipWithIndex.map { case ((_, u, t), i) => (i.toLong, u, t) }
      val marks = Seq.fill(15)(
        (100L + rnd.nextLong(100), rnd.nextLong(4), rnd.nextLong(20)))
      val expected = events.map { case (id, u, t) =>
        val cand = marks.filter(m => m._2 == u && m._3 <= t)
        id -> (if (cand.isEmpty) None
               else {
                 val best = cand.maxBy(m => (m._3, m._1))
                 if (t - best._3 <= tol) Some(best._1) else None
               })
      }.toMap
      assert(runTol(events, marks, tol) == expected, s"tol=$tol")
    }
  }

  test("tolerance rejects a payload that names the time column") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 3L, 101L)).toDF("user_id", "ts", "mark_id")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asofJoinTolerance(l, r, Seq("user_id"), "ts",
        Seq("mark_id", "ts"), 5L)
    }
  }

  test("a NULL right time is never visible (SQL `<= t` semantics)") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L), (2L, 1L, 2L)).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, Option.empty[Long], 100L), (1L, Some(3L), 101L))
      .toDF("user_id", "ts", "mark_id")
    val out = AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", Seq("mark_id"))
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    // event at t=5 sees only the t=3 mark; event at t=2 sees nothing —
    // in neither case does the null-time mark's payload leak through
    assert(out == Map(1L -> Some(101L), 2L -> None))
  }

  test("rejects a left input already carrying the output column") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L)).toDF("asof", "user_id", "ts")
    val r = Seq((1L, 3L, 101L)).toDF("user_id", "ts", "mark_id")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", Seq("mark_id"))
    }
  }

  private def runSalted(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], salts: Int): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    AsOfJoin.asofJoinSalted(l, r, Seq("user_id"), "ts", Seq("mark_id"), salts)
      .select(col("event_id"), col("asof.mark_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
  }

  test("salted variant matches the plain as-of on a hot-key distribution") {
    val rnd = new scala.util.Random(99)
    // 90% of left rows land on key 0 — the shape the salting exists
    // for; ties and mark-less keys included
    val events = (0 until 600).map { i =>
      val u = if (rnd.nextInt(10) < 9) 0L else 1 + rnd.nextLong(3)
      (i.toLong, u, rnd.nextLong(50))
    }
    val marks = Seq.fill(25)(
      (100L + rnd.nextLong(100), rnd.nextLong(4), rnd.nextLong(50)))
    val expected = run(events, marks) // the oracled plain form
    for (salts <- Seq(1, 4, 16)) {
      assert(runSalted(events, marks, salts) == expected,
        s"salted ($salts) diverged from plain as-of")
    }
  }

  test("salting measurably bounds the hot key's per-task shuffle input") {
    // the skew claim measured, not argued: on a 90%-hot-key
    // distribution the hottest task's shuffle-read row count must
    // drop materially when the hot key is salted across sub-groups
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // a fresh session with AQE partition-coalescing OFF: at this toy
    // byte size AQE folds every shuffle partition into one task, which
    // hides exactly the per-task bound this test measures (at real
    // scale partitions are far above the coalesce target and spread)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // enough partitions that the 8 salt sub-groups of the hot key can
    // actually land on distinct tasks (4 would co-hash pairs of them)
    s.conf.set("spark.sql.shuffle.partitions", "16")
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val events = (0 until 20000).map { i =>
      val u = if (rnd.nextInt(10) < 9) 0L else 1 + rnd.nextLong(3)
      (i.toLong, u, rnd.nextLong(1000))
    }.toDF("event_id", "user_id", "ts")
    val marks = Seq.fill(50)(
      (100L + rnd.nextLong(1000), rnd.nextLong(4), rnd.nextLong(1000)))
      .toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))

    def maxTaskShuffleRows(salts: Int): Long = {
      val max = new AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            max.updateAndGet(v => math.max(v, m.shuffleReadMetrics.recordsRead))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // aggregate over the WINDOW's output, not count(): an unused
        // window column gets pruned away and the whole exchange with it
        AsOfJoin.asofJoinSalted(events, marks,
          Seq("user_id"), "ts", Seq("mark_id"), salts)
          .agg(sum(col("asof.mark_id"))).collect()
        // the listener bus is async — wait for quiescence
        var last = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val c = max.get
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
        max.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val m1 = maxTaskShuffleRows(1)
    val m8 = maxTaskShuffleRows(8)
    // hot key ~18k left rows: unsalted they sort in ONE task; 8 salts
    // split them ~2.3k per sub-group (+ replicated right side). Even
    // with sub-groups co-hashed onto the 4 test partitions the max
    // task must at least halve; the right-side replication cost is
    // 50 x 8 rows — noise
    assert(m8 * 2 <= m1, s"salts=8 max task rows $m8 vs salts=1 $m1")
  }

  test("measured as-of matches plain and manual-salted forms on the hot distribution") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // 90% of left rows on key 0, the rest over 30 cold keys — wide
    // enough that the hot key clears measureSkew's 5x-mean gate
    // (with only a handful of keys a 90% key is merely ~4x the mean
    // and the measurement CORRECTLY declines)
    val events = (0 until 600).map { i =>
      val u = if (rnd.nextInt(10) < 9) 0L else 1 + rnd.nextLong(30)
      (i.toLong, u, rnd.nextLong(50))
    }
    val marks = Seq.fill(25)(
      (100L + rnd.nextLong(100), rnd.nextLong(31), rnd.nextLong(50)))
    val l = events.toDF("event_id", "user_id", "ts")
    val r = marks.toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    def toMapOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("asof.mark_id")).collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    val plain = run(events, marks)
    // the measurement must actually decide to salt here…
    val profile = Skew.measureSkew(l, "user_id")
    assert(profile.hotKeys.contains(0L) && profile.salts > 1,
      s"90%-hot distribution must measure as salt-worthy: $profile")
    // …and the measured form must equal the plain form exactly
    assert(toMapOf(AsOfJoin.asofJoinMeasured(
      l, r, "user_id", "ts", Seq("mark_id"))) == plain)
    // the profile-driven overload equals the manual form too
    assert(toMapOf(AsOfJoin.asofJoinSaltedFor(
      profile, l, r, "user_id", "ts", Seq("mark_id"))) == plain)
    assert(runSalted(events, marks, profile.salts) == plain)
  }

  test("measured as-of on uniform keys declines to salt (plain plan)") {
    import spark.implicits._
    val l = (1 to 400).map(i => (i.toLong, i.toLong % 20, i.toLong))
      .toDF("event_id", "user_id", "ts")
    val r = (1 to 20).map(i => (i.toLong, i.toLong % 20, i.toLong * 3))
      .toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    val profile = Skew.measureSkew(l, "user_id")
    assert(profile.hotKeys.isEmpty || profile.salts <= 1,
      s"uniform keys must not measure as salt-worthy: $profile")
    val plan = AsOfJoin.asofJoinSaltedFor(
      profile, l, r, "user_id", "ts", Seq("mark_id"))
      .queryExecution.executedPlan.toString
    // declined salting = the PLAIN single-shuffle window plan, with
    // no salt column anywhere in it
    assert(!plan.contains("__salt"), s"uniform keys still paid a salt:\n$plan")
    assert(!plan.contains("Join"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("salted variant keeps the no-join single-data-shuffle plan") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong, i.toLong % 7, i.toLong))
      .toDF("event_id", "user_id", "ts")
    val r = (1 to 20).map(i => (i.toLong, i.toLong % 7, i.toLong * 3))
      .toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    val plan = AsOfJoin
      .asofJoinSalted(l, r, Seq("user_id"), "ts", Seq("mark_id"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"salted as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  test("plans as one shuffle and zero joins") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong, i.toLong % 7, i.toLong))
      .toDF("event_id", "user_id", "ts")
    val r = (1 to 20).map(i => (i.toLong, i.toLong % 7, i.toLong * 3))
      .toDF("mark_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("mark_id"))
    val plan = AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", Seq("mark_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }
}
