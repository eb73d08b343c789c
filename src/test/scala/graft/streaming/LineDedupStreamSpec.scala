package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming incremental line dedup: per-batch admission must equal
  * the batch operator against the same index, the keep-first rule
  * holds WITHIN a batch, admit-and-grow makes batch N's lines
  * boilerplate to batch N+1, and a crash-replayed batch converges.
  */
case class LDoc(doc_id: Long, text: String)

class LineDedupStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def sig(lines: Seq[String]): String =
    md5hex(lines.map(md5hex).mkString("\n"))

  private lazy val base = {
    import spark.implicits._
    Seq(LDoc(1, "a\nb\nc"), LDoc(2, "d\ne")).toDF("doc_id", "text")
  }

  private def readStats(out: String): Map[Long, (Long, Long, String)] =
    spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap

  test("streamed admission equals the batch operator; keep-first within batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val index = LineDedupStream.buildIndex(base).persist()
    index.count()
    val out = Files.createTempDirectory("ld_out").toString
    val in = MemoryStream[LDoc]
    val q = LineDedupStream.admissionStream(spark, in.toDS().toDF(),
      index, out, Files.createTempDirectory("ld_ckpt").toString)
    try {
      // batch 1: doc 10 re-uses base line 'a', brings x/y; doc 11's
      // 'x' loses to doc 10 (keep-first within the batch), keeps z
      in.addData(LDoc(10, "a\nx\ny"), LDoc(11, "x\nz"))
      q.processAllAvailable()
      // batch 2 (NO grow): 'x' is unseen by the static base again
      in.addData(LDoc(20, "x\nq"))
      q.processAllAvailable()
    } finally q.stop()
    val got = readStats(out)
    assert(got(10L) === ((3L, 2L, sig(Seq("x", "y")))))
    assert(got(11L) === ((2L, 1L, sig(Seq("z")))))
    assert(got(20L) === ((2L, 2L, sig(Seq("x", "q")))),
      "without grow, a static index cannot see batch 1's lines")
    // parity with the batch operator per micro-batch
    val b1 = LineDedupStream.admitBatch(
      Seq(LDoc(10, "a\nx\ny"), LDoc(11, "x\nz")).toDF("doc_id", "text"),
      index).collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2), r.getString(3)))).toMap
    assert(b1 === got.filter(_._1 < 20L))
    index.unpersist()
  }

  test("admit-and-grow: batch N's lines are boilerplate to batch N+1") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val index = LineDedupStream.buildIndex(base).persist()
    index.count()
    val out = Files.createTempDirectory("ldg_out").toString
    val grow = Files.createTempDirectory("ldg_idx").toString
    val in = MemoryStream[LDoc]
    val q = LineDedupStream.admissionStream(spark, in.toDS().toDF(),
      index, out, Files.createTempDirectory("ldg_ckpt").toString, grow)
    try {
      in.addData(LDoc(10, "x\ny"))
      q.processAllAvailable()
      // 'x' grew the index in batch 0 -> rejected here; 'w' is new
      in.addData(LDoc(20, "x\nw"))
      q.processAllAvailable()
    } finally q.stop()
    val got = readStats(out)
    assert(got(10L) === ((2L, 2L, sig(Seq("x", "y")))))
    assert(got(20L) === ((2L, 1L, sig(Seq("w")))),
      "grown index must reject batch 0's line")
    index.unpersist()
  }

  test("crash-replayed batch converges (same stats, same growth shard)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val index = LineDedupStream.buildIndex(base).persist()
    index.count()
    val out = Files.createTempDirectory("ldr_out").toString
    val grow = Files.createTempDirectory("ldr_idx").toString
    val ckpt = Files.createTempDirectory("ldr_ckpt").toString
    val in1 = MemoryStream[LDoc]
    val q1 = LineDedupStream.admissionStream(spark, in1.toDS().toDF(),
      index, out, ckpt, grow,
      postBatchHook = _ => sys.error("injected crash"))
    in1.addData(LDoc(10, "x\ny"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    // resume: the batch replays — its own growth shard from the
    // crashed run must be excluded from its read, stats re-derived
    val in2 = MemoryStream[LDoc]
    val q2 = LineDedupStream.admissionStream(spark, in2.toDS().toDF(),
      index, out, ckpt, grow)
    try q2.processAllAvailable() finally q2.stop()
    val got = readStats(out)
    assert(got === Map(10L -> ((2L, 2L, sig(Seq("x", "y"))))),
      s"replay diverged: $got")
    // exactly one growth shard, holding exactly the kept digests
    val grown = spark.read.parquet(grow).collect()
      .map(_.getString(0)).toSet
    assert(grown === Set(md5hex("x"), md5hex("y")))
    index.unpersist()
  }
}
