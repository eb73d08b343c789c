package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextOps

/** Release-time index rebuild: compacting base ∪ growth shards into
  * one artifact must change NOTHING an admission decides — the next
  * batch's verdicts against the rebuilt artifact equal its verdicts
  * against base + shards, for both the line index and the MinHash
  * signature index.
  */
class IndexRebuildSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("rebuilt line index is admission-equivalent to base + shards") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = Seq((1L, "a\nb"), (2L, "c")).toDF("doc_id", "text")
    val index = LineDedupStream.buildIndex(base).persist()
    index.count()
    val out = Files.createTempDirectory("ir_out").toString
    val grow = Files.createTempDirectory("ir_idx").toString
    val in = MemoryStream[LDoc]
    val q = LineDedupStream.admissionStream(spark, in.toDS().toDF(),
      index, out, Files.createTempDirectory("ir_ckpt").toString, grow)
    try {
      in.addData(LDoc(10, "x\ny"))
      q.processAllAvailable()
      in.addData(LDoc(20, "z\nx"))
      q.processAllAvailable()
    } finally q.stop()

    val rebuiltPath = Files.createTempDirectory("ir_rebuilt").toString
    IndexRebuild.compactLineIndex(spark, index, grow, rebuiltPath)
    val rebuilt = spark.read.parquet(rebuiltPath)
    // exactly base ∪ grown digests, deduplicated
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val got = rebuilt.collect().map(_.getString(0)).toSeq
    assert(got.size == got.distinct.size, "rebuild left duplicates")
    assert(got.toSet ==
      Set("a", "b", "c", "x", "y", "z").map(md5hex))
    // the NEXT batch decides identically against the compacted
    // artifact and against base ∪ live shards
    val next = Seq((30L, "x\nq"), (31L, "z\nb\nw")).toDF("doc_id", "text")
    val viaShards = TextOps.lineAdmitStats(next,
      index.unionByName(spark.read.parquet(grow).select("lh"))).collect().toSet
    val viaRebuilt = TextOps.lineAdmitStats(next, rebuilt).collect().toSet
    assert(viaRebuilt == viaShards)
    index.unpersist()
  }

  test("rebuilt signature index is admission-equivalent (near-dup)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val index = NearDupStream.buildBaseIndex(docs).persist()
    index.count()
    val f = NDoc(8000001L,
      "granite obelisks lined the silent causeway under violet skies")
    val g = NDoc(8000002L, f.text) // exact copy, arrives after rebuild
    val out = Files.createTempDirectory("irs_out").toString
    val grow = Files.createTempDirectory("irs_idx").toString
    val in = MemoryStream[NDoc]
    val q = NearDupStream.admissionStream(spark, in.toDS().toDF(),
      index, out, Files.createTempDirectory("irs_ckpt").toString, grow)
    try {
      in.addData(f)
      q.processAllAvailable()
    } finally q.stop()

    val rebuiltPath = Files.createTempDirectory("irs_rebuilt").toString
    IndexRebuild.compactSignatureIndex(spark, index, grow, rebuiltPath)
    val rebuilt = spark.read.parquet(rebuiltPath)
    assert(rebuilt.count() == index.count() + 1,
      "rebuild must add exactly the one admitted doc's signature row")
    // g (a copy of the GROWN doc f) must reject against the rebuilt
    // artifact exactly as it would against base + live shards
    val verdict = NearDupStream.admitBatch(
        Seq(g).toDF("doc_id", "text"), rebuilt)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(3))).toSeq
    assert(verdict == Seq((g.doc_id, f.doc_id, false)),
      s"copy of a grown doc must reject with best_base=f: $verdict")
    index.unpersist()
  }
}
