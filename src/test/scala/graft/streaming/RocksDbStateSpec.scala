package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.FlightSample
import graft.sources.{Dims, FlightGen}
import graft.streaming.ApproachStream.TimedSample
import graft.streaming.AsOfStream.{Event, Mark}

/** Scale rehearsal of the stateful streams under the RocksDB state
  * store — the provider a production cluster runs so state is bounded
  * by disk, not executor heap. Same code, 10x the keys of the base
  * specs (10 flights vs 1; 20 mark-only users vs 2), asserting the
  * two properties the heap-backed specs established survive the
  * provider swap: (1) full batch/stream parity of the emitted rows,
  * and (2) state EVICTION — after the watermark passes every key,
  * the store drains to exactly the in-flight sentinel, so long-lived
  * streams hold state proportional to LIVE keys, never total keys
  * seen. Each test also proves RocksDB actually served the state
  * (provider-specific custom metrics present in the progress), so a
  * silently-ignored conf can't turn this into a heap-store re-run.
  */
class RocksDbStateSpec extends AnyFunSuite {

  private lazy val base = SparkSpec.spark

  /** Sibling session: shares the SparkContext, own SQLConf — the
    * RocksDB provider applies to streams started HERE without
    * flipping the shared session the parallel suites use.
    */
  private def rocksSession(): SparkSession = {
    val s = base.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s
  }

  private def assertRocksServed(q: StreamingQuery): Unit = {
    val metrics = q.lastProgress.stateOperators.head.customMetrics
    assert(!metrics.isEmpty && metrics.keySet.stream()
        .anyMatch(k => k.startsWith("rocksdb")),
      s"no rocksdb custom metrics — the provider conf was not honored: " +
        s"${metrics.keySet}")
  }

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("approach stream: 10 flights on RocksDB — batch parity, state drains") {
    val spark = rocksSession()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val baseMs = 86400000L
    val samples: Seq[FlightSample] = FlightGen
      .trace(spark.range(0, 10).toDF("flight"))
      .as[FlightSample].collect().sortBy(s => (s.flight, s.time)).toSeq
    def at(s: FlightSample) =
      TimedSample(new Timestamp(baseMs + s.time * 1000), s)

    val in = MemoryStream[TimedSample]
    val q = ApproachStream.detectApproaches(in.toDS(),
        Dims.syntheticAirports(), gapSeconds = 60, watermark = "2 minutes")
      .writeStream.format("memory").queryName("rocks_approaches")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(samples.map(at): _*)
      q.processAllAvailable()
      // sentinel flight pushes the watermark past every gap twice
      // (the first batch applies it, the second fires the timeouts)
      val probe = samples.head.copy(flight = 999L)
      in.addData(TimedSample(new Timestamp(baseMs + 3600L * 1000), probe))
      q.processAllAvailable()
      in.addData(TimedSample(new Timestamp(baseMs + 7200L * 1000), probe))
      q.processAllAvailable()

      assertRocksServed(q)
      // eviction: all 10 flights emitted and removed; only the
      // sentinel's own buffer may remain in the store
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1,
        s"RocksDB store holds $stateRows rows; expected only the " +
          "in-flight sentinel — timed-out flight state not evicted")
    } finally q.stop()

    val key = (a: graft.model.Approach) =>
      (a.flight_id, a.approach_id, a.airport_id, a.approach_start,
        a.approach_end, a.landing_type, a.unstable)
    val got = spark.table("rocks_approaches")
      .as[graft.model.Approach].collect()
      .filter(_.flight_id != 999L).map(key).toSet
    val expected = graft.approach.ApproachPipeline
      .detectApproaches(samples.toDS(), Dims.syntheticAirports())
      .collect().map(key).toSet
    assert(got == expected && got.nonEmpty,
      s"stream/batch mismatch: ${got.size} vs ${expected.size} approaches")
  }

  test("as-of stream: 20 mark-only users on RocksDB are all evicted") {
    val spark = rocksSession()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evIn = MemoryStream[Event]
    val mkIn = MemoryStream[Mark]
    val q = AsOfStream
      .asofEnrichStreamTolerance(evIn.toDS(), mkIn.toDS(), 5000L,
        "10 seconds")
      .writeStream.format("memory").queryName("rocks_asof")
      .outputMode("append").start()
    try {
      // 10x the base spec's churned-key shape: 20 users that produce
      // marks and then fall silent forever
      mkIn.addData((1L to 20L).flatMap(u =>
        Seq(Mark(u * 100, u, ts(10)), Mark(u * 100 + 1, u, ts(12)))): _*)
      evIn.addData(Event(1, 50, ts(5)))
      q.processAllAvailable()
      // advance the watermark far past mark ts + tolerance; each
      // batch fires the timeouts the previous one registered
      for (t <- Seq(100L, 200L, 300L)) {
        evIn.addData(Event(900 + t, 999, ts(t)))
        q.processAllAvailable()
      }
      assertRocksServed(q)
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1,
        s"RocksDB store holds $stateRows rows; expected only the " +
          "in-flight sentinel — mark-only state survived the timeout " +
          "under RocksDB")
    } finally q.stop()
  }

  // r12 (the r11 verdict's rehearsal-refresh item): the ingest's
  // per-key state is the curated TABLE itself (foreachBatch merge +
  // digest probe), not a state-store — so the provider swap must be
  // a structural no-op for it, and the whole r10/r11-era protocol
  // (quarantine routing, in-batch window dedup, cross-batch
  // delta-dedup, post-merge crash replay) must converge identically
  // in a RocksDB-provider session. The zero-state assert keeps this
  // honest the same way MonitorStateSpec does for the partials-only
  // monitors: if a refactor ever grows a state-store operator inside
  // the ingest, this goes red and the eviction story must be argued.
  test("curated ingest under RocksDB: no store state, replay converges") {
    val spark = rocksSession()
    val root = Files.createTempDirectory("rocks_ingest")
    val drop = Files.createDirectories(root.resolve("drop"))
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("curated").toString
    val goodText =
      "the quick brown fox jumps over the lazy dog and the cat is of " +
        "the essence to win in the long game of the seasons"
    def jline(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    def dropShard(name: String, lines: Seq[String]): Unit = {
      val tmp = Files.createTempFile("shard", ".jsonl")
      Files.write(tmp, lines.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, drop.resolve(name))
    }
    // batch 1: two keepers, one in-batch dup, one malformed line
    // (quarantine route)
    dropShard("s1.jsonl", Seq(
      jline(1, goodText),
      jline(2, goodText + " again and again the end is near to all"),
      jline(3, goodText),
      """{"doc_id":oops"""))
    val q1 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try {
      q1.processAllAvailable()
      assert(q1.lastProgress != null &&
        q1.lastProgress.stateOperators.isEmpty,
        "ingest grew state-store operators under RocksDB")
    } finally q1.stop()
    // batch 2: crash AFTER the merge, BEFORE the checkpoint commit —
    // the replay under the RocksDB session must converge (doc 5 once),
    // and the cross-batch digest probe must drop doc 7's replayed text
    dropShard("s2.jsonl", Seq(
      jline(5, goodText + " a tale of two cities and the best of times"),
      jline(7, goodText)))
    val q2 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt,
      postMergeHook = _ => sys.error("injected crash"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination()
    }
    q2.stop()
    val q3 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    val ids = Ingest.readCurated(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L),
      s"RocksDB-session ingest state diverged: $ids")
    val quarantined = spark.read.json(Ingest.quarantinePath(table))
    assert(quarantined.count() == 1 &&
      quarantined.head().getAs[String]("reason") == "malformed")
  }
}
