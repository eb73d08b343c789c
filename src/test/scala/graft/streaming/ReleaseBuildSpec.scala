package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextOps

/** The composed release build: all four admission artifacts land
  * under one root, the manifest rename is the ONE visibility step
  * (a crash mid-build leaves no manifest — the previous release
  * stays authoritative), and admissions against the released
  * artifacts equal admissions against base ∪ growth.
  */
class ReleaseBuildSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def words(p: String, n: Int) =
    (1 to n).map(i => s"$p$i").mkString(" ")

  test("release lands all four artifacts; admissions match base ∪ growth") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = Seq(
      (1L, words("ash", 12)), (2L, words("elm", 12)),
      // a planted near-dup pair so the keeper map has a real cluster
      (5L, words("oak", 20)),
      (6L, words("oak", 20).replace("oak20", "oakzz")))
      .toDF("doc_id", "text")
    val admitted = Seq((10L, words("fir", 12))).toDF("doc_id", "text")
    val corpus = base.unionByName(admitted)

    val lineBase = LineDedupStream.buildIndex(base)
    val sigBase = NearDupStream.buildBaseIndex(base)
    val lineGrow = Files.createTempDirectory("rb_lg").toString
    val sigGrow = Files.createTempDirectory("rb_sg").toString
    TextOps.buildLineIndex(admitted)
      .write.parquet(s"$lineGrow/batch=0")
    NearDupStream.buildBaseIndex(admitted)
      .write.parquet(s"$sigGrow/batch=0")

    val root = Files.createTempDirectory("rb_rel").toString
    val m = ReleaseBuild.release(spark, corpus, lineBase, lineGrow,
      sigBase, sigGrow, root)
    assert(ReleaseBuild.readManifest(spark, root).contains(m))

    // line index: exactly base ∪ growth digests
    val line = spark.read.parquet(m.lineIndex)
    val wantLine = lineBase.unionByName(
        spark.read.parquet(s"$lineGrow/batch=0")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(line.collect().map(_.getString(0)).toSet == wantLine)

    // signature index: one row per corpus doc
    assert(spark.read.parquet(m.signatureIndex)
      .select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 5L, 6L, 10L))

    // prefix index: a near-copy of the ADMITTED doc rejects against
    // the released artifacts (the rebuild saw growth), a fresh admits
    val verdicts = PrefixDedupStream.admitBatch(
        Seq((20L, words("fir", 12).replace("fir12", "pine1")),
          (21L, words("yew", 12))).toDF("doc_id", "text"),
        spark.read.parquet(m.prefixOrdered),
        spark.read.parquet(m.prefixDf))
      .select("doc_id", "admit").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(verdicts == Set((20L, false), (21L, true)), s"$verdicts")

    // keeper map: the near-dup pair shares keeper + split
    val km = spark.read.parquet(m.keeperMap).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keeper"), r.getAs[String]("split"))).toMap
    assert(km.keySet == Set(1L, 2L, 5L, 6L, 10L))
    assert(km(5L) == km(6L), s"pair must share keeper+split: $km")
  }

  test("crash between artifacts: no manifest, previous release stays " +
      "authoritative; re-run completes") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = Seq((1L, words("ash", 12))).toDF("doc_id", "text")
    val lineBase = LineDedupStream.buildIndex(base)
    val sigBase = NearDupStream.buildBaseIndex(base)
    val lineGrow = Files.createTempDirectory("rb_lg2").toString
    val sigGrow = Files.createTempDirectory("rb_sg2").toString

    // release v1 — the authoritative one
    val v1 = Files.createTempDirectory("rb_v1").toString
    ReleaseBuild.release(spark, base, lineBase, lineGrow, sigBase,
      sigGrow, v1)
    assert(ReleaseBuild.readManifest(spark, v1).isDefined)

    // release v2 crashes after the second artifact
    val v2 = Files.createTempDirectory("rb_v2").toString
    intercept[RuntimeException] {
      ReleaseBuild.release(spark, base, lineBase, lineGrow, sigBase,
        sigGrow, v2, afterArtifact = {
          case ReleaseBuild.SignaturePath => sys.error("injected crash")
          case _ => ()
        })
    }
    assert(ReleaseBuild.readManifest(spark, v2).isEmpty,
      "a torn release must be invisible")
    assert(ReleaseBuild.readManifest(spark, v1).isDefined,
      "the previous release stays authoritative")

    // re-running the same build overwrites the torn dir and lands
    val m2 = ReleaseBuild.release(spark, base, lineBase, lineGrow,
      sigBase, sigGrow, v2)
    assert(ReleaseBuild.readManifest(spark, v2).contains(m2))
    assert(spark.read.parquet(m2.keeperMap).count() == 1L)

    // release roots are WRITE-ONCE: building into a root whose
    // manifest landed must refuse (overwriting artifacts under live
    // readers), not silently rebuild
    val e = intercept[IllegalArgumentException] {
      ReleaseBuild.release(spark, base, lineBase, lineGrow, sigBase,
        sigGrow, v2)
    }
    assert(e.getMessage.contains("already released"))
  }

  test("manifest escaping: quote/backslash roots neither corrupt the " +
      "JSON nor poison readManifest (r16 advice)") {
    // the escape pair round-trips the hostile characters a root can
    // legally carry (Windows separators, quotes, control chars)
    for (s <- Seq("""C:\srv\share""", """it"s "quoted"""", "a\\\"b",
        "ctl\u0001\u001f", "plain/posix"))
      assert(ReleaseBuild.jsonUnescape(ReleaseBuild.jsonEscape(s)) == s,
        s"round-trip: $s")
    // end-to-end: a release into a root whose path contains '"'
    // (legal on POSIX) writes a valid manifest and reads back whole
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = Seq((1L, words("ash", 12))).toDF("doc_id", "text")
    val lineBase = LineDedupStream.buildIndex(base)
    val sigBase = NearDupStream.buildBaseIndex(base)
    val lineGrow = Files.createTempDirectory("rb_lg3").toString
    val sigGrow = Files.createTempDirectory("rb_sg3").toString
    val odd = Files.createTempDirectory("rb_q")
      .resolve("""it"s a root""").toString
    val m = ReleaseBuild.release(spark, base, lineBase, lineGrow,
      sigBase, sigGrow, odd)
    assert(ReleaseBuild.readManifest(spark, odd).contains(m))
    assert(m.keeperMap.contains("""it"s a root"""),
      "the unescaped path must survive the manifest round-trip")
    assert(spark.read.parquet(m.keeperMap).count() == 1L)
  }
}
