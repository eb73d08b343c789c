package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextQueries

/** The composed drop-folder ingest (JSONL stream → curation → keyed
  * merge) must deliver exactly-once TABLE state from at-least-once
  * EXECUTION: shards already checkpointed are not re-ingested on
  * restart, and a crash after a batch's merge but before its
  * checkpoint commit replays the batch whose idempotent upsert
  * converges — no duplicate keys, same rows as the batch-mode oracle.
  */
class IngestSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  // Curation fixtures: "en" needs stopword hits, quality >= 5000 needs
  // long-enough tokens + stopword density (q35's score); "zz"-style
  // text lands und -> dropped; an exact copy of another doc -> dup.
  private val goodText =
    "the quick brown fox jumps over the lazy dog and the cat is of " +
      "the essence to win in the long game of the seasons"

  private def jline(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  private def dropShard(dir: Path, name: String, lines: Seq[String]): Unit = {
    // land atomically the way a real drop-folder producer does: write
    // a temp file next to the dir, then move it in
    val tmp = Files.createTempFile("shard", ".jsonl")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(name))
  }

  test("exactly-once table state across restart AND post-merge crash replay") {
    val root = Files.createTempDirectory("ingest")
    val drop = Files.createDirectories(root.resolve("drop"))
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("curated").toString

    // ---- phase 1: two good docs, one exact dup, one junk doc ----
    dropShard(drop, "s1.jsonl", Seq(
      jline(1, goodText),
      jline(2, goodText + " again and again the end is near to all"),
      jline(3, goodText),            // dup of doc 1 -> dropped
      jline(4, "zzz qqq xxx")))      // und -> dropped
    val q1 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    val after1 = Ingest.readCurated(spark, table)
    assert(after1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))

    // ---- phase 2: restart with a NEW shard; the query must resume
    // from the checkpoint (s1 not re-read) and crash right after the
    // merge, before the checkpoint commit ----
    dropShard(drop, "s2.jsonl", Seq(
      jline(5, goodText + " a tale of two cities and the best of times"),
      jline(6, "yyy www vvv")))      // und -> dropped
    var batches = 0
    val q2 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt,
      postMergeHook = { _ => batches += 1; sys.error("injected crash") })
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination()
    }
    q2.stop()
    assert(batches == 1, s"restart must process exactly the new shard, got $batches")
    // the merge landed before the crash: doc 5 is already in the table
    assert(Ingest.readCurated(spark, table).count() == 3)

    // ---- phase 3: resume; Spark replays the uncommitted batch, the
    // upsert converges instead of duplicating ----
    val q3 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q3.processAllAvailable() finally q3.stop()

    val fin = Ingest.readCurated(spark, table)
    val ids = fin.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L), s"exactly-once violated: $ids")

    // ---- phase 4: CROSS-BATCH dup — doc 7 replays doc 1's text under
    // a new id (must drop via the q80 delta-dedup probe against the
    // accumulated table); doc 8 is genuinely new (must land) ----
    dropShard(drop, "s3.jsonl", Seq(
      jline(7, goodText),
      jline(8, goodText + " but every new beginning is the start of it all")))
    val q4 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q4.processAllAvailable() finally q4.stop()
    val ids4 = Ingest.readCurated(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids4 == Seq(1L, 2L, 5L, 8L),
      s"cross-batch dup not dropped (or new doc lost): $ids4")

    // per-row parity with the batch-mode curation on the union of ALL
    // landed docs: the within-batch dedup (doc 3) and the cross-batch
    // digest probe (doc 7) must together equal what one global batch
    // curation would have decided
    import spark.implicits._
    val allDocs = Seq(
      (1L, goodText),
      (2L, goodText + " again and again the end is near to all"),
      (3L, goodText),
      (4L, "zzz qqq xxx"),
      (5L, goodText + " a tale of two cities and the best of times"),
      (6L, "yyy www vvv"),
      (7L, goodText),
      (8L, goodText + " but every new beginning is the start of it all"))
      .toDF("doc_id", "text")
    val oracle = TextQueries.curate(allDocs).filter(col("keep"))
      .select("doc_id", "lang_pred", "quality_e4", "split")
    val got = Ingest.readCurated(spark, table)
      .select("doc_id", "lang_pred", "quality_e4", "split")
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty,
      "streamed table diverges from batch curation")

    // ---- phase 5: duplicate doc_id WITHIN one shard (at-least-once
    // producer retry): exactly one row lands, deterministically the
    // smallest-digest text — never two rows on one (doc_id, rev) key
    val t9a = goodText + " version alpha of the ninth document tale"
    val t9b = goodText + " version beta of the ninth document tale"
    dropShard(drop, "s4.jsonl", Seq(jline(9, t9a), jline(9, t9b)))
    val q5 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q5.processAllAvailable() finally q5.stop()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    val rows9 = Ingest.readCurated(spark, table)
      .filter(col("doc_id") === 9).select("text_md5").collect()
    assert(rows9.length == 1,
      s"duplicate doc_id upserted ${rows9.length} rows onto one key")
    val winner = if (md5hex(t9a) < md5hex(t9b)) t9a else t9b
    assert(rows9.head.getString(0) == md5hex(winner),
      "in-batch doc_id dedup is not the documented smallest-digest rule")

    // ---- phase 6: poison shard — a malformed line, an ill-typed
    // doc_id, and a line missing its text must all quarantine (raw
    // line preserved, reason recorded) without killing the stream or
    // leaking a null-keyed row into the table; the good line in the
    // same shard still lands ----
    val badJson = """{"doc_id":11,"text":"unterminated"""
    val badType = """{"doc_id":"abc","text":"the id is the wrong type"}"""
    dropShard(drop, "s5.jsonl", Seq(
      jline(10, goodText + " the tenth tale arrives intact and is of the note"),
      badJson,
      badType,
      """{"doc_id":12}"""))
    val q6 = Ingest.curatedJsonlIngest(spark, drop.toString, table, ckpt)
    try q6.processAllAvailable() finally q6.stop()
    val ids6 = Ingest.readCurated(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids6 == Seq(1L, 2L, 5L, 8L, 9L, 10L),
      s"poison shard corrupted the table (or dropped its good line): $ids6")
    val quarantined = spark.read
      .schema("raw STRING, reason STRING")
      .json(Ingest.quarantinePath(table))
      .select("raw", "reason").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(quarantined.map(_._2).sorted.toSeq
      == Seq("malformed", "malformed", "null_key"),
      s"wrong quarantine set: ${quarantined.toSeq}")
    // EVERY quarantined line — malformed, ill-typed, AND null-key —
    // must be the original shard line byte-identical (the null-key
    // case is exactly what the _corrupt_record approach loses)
    assert(quarantined.map(_._1).toSet
      == Set(badJson, badType, """{"doc_id":12}"""),
      s"raw lines not preserved byte-identical: ${quarantined.toSeq}")
  }
}
