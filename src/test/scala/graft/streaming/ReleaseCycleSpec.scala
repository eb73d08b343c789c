package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextOps

/** The END-TO-END release cycle (r16 verdict #1) — every step of the
  * documented protocol driven in ONE test, where the per-artifact
  * specs (IndexRebuildSpec, ReleaseBuildSpec) each proved only their
  * own stage:
  *
  *   1. start the three admission streams (line dedup with
  *      admit-and-grow, near-dup with admit-and-grow, prefix
  *      admission) against the v1 base artifacts;
  *   2. admit crawl batch A through all three; QUIESCE (stop) them —
  *      IndexRebuild's step-0 precondition;
  *   3. `ReleaseBuild.release` into a fresh versioned root (corpus =
  *      base ∪ the docs batch A's admission accepted);
  *   4. restart every stream against the MANIFEST's base paths with
  *      fresh growth dirs and fresh checkpoints;
  *   5. delete the OLD growth dirs (protocol step 3 — the restarted
  *      streams must not depend on them);
  *   6. admit crawl batch B and assert its verdicts/stats equal the
  *      SINGLE-CORPUS derivation for every artifact — i.e. the swap
  *      was semantically invisible: a stream that had seen one
  *      never-compacted corpus from the start would have said exactly
  *      the same thing.
  *
  * Single-corpus baselines per artifact (each family's own semantics,
  * not one blanket rule): the LINE index remembers every line ever
  * seen (line-granular admission — all of batch A feeds it); the
  * SIGNATURE index grows by ADMITTED docs only; the prefix index and
  * keeper map re-derive from the curated corpus (base ∪ admitted).
  */
class ReleaseCycleSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def words(p: String, n: Int) =
    (1 to n).map(i => s"$p$i").mkString(" ")

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("full cycle: streams -> quiesce -> release -> restart on the " +
      "manifest -> batch B equals the single-corpus derivation " +
      "across all four artifacts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)

    // base corpus, with a planted near-dup pair (5, 6) so the keeper
    // map carries a real cluster across the release
    val b0 = Seq(
      (1L, words("ash", 12)), (2L, words("elm", 12)),
      (5L, words("oak", 20)),
      (6L, words("oak", 20).replace("oak20", "oakzz")))
      .toDF("doc_id", "text")
    // batch A: two fresh docs + a near-copy of base doc 1
    val batchA = Seq(
      (10L, words("fir", 12)),
      (11L, words("ash", 12).replace("ash12", "ashqq")),
      (12L, words("gum", 14)))
    // batch B: a near-copy of A-ADMITTED doc 10 (rejected only if the
    // release carried A's admissions into the new base), a fresh doc,
    // a near-copy of BASE doc 5 (the old base must still gate), and
    // an exact line-copy of doc 10 (the line index must remember A)
    val batchB = Seq(
      (20L, words("fir", 12).replace("fir12", "pine1")),
      (21L, words("yew", 12)),
      (22L, words("oak", 20).replace("oak20", "oakpp")),
      (23L, words("fir", 12)))

    // ---- v1 base artifacts ----
    val lineBase = LineDedupStream.buildIndex(b0)
    val sigBase = NearDupStream.buildBaseIndex(b0)
    val (pfxOrd, pfxDf) = PrefixDedupStream.buildBaseIndex(b0)
    val (growLine1, growSig1) = (tmp("rc_lg1"), tmp("rc_sg1"))
    val (outLine1, outSig1, outPfx1) =
      (tmp("rc_lo1"), tmp("rc_so1"), tmp("rc_po1"))

    // ---- phase 1: streams up, batch A admitted, quiesce ----
    val inL1 = MemoryStream[(Long, String)]
    val inS1 = MemoryStream[(Long, String)]
    val inP1 = MemoryStream[(Long, String)]
    val qL1 = LineDedupStream.admissionStream(spark,
      inL1.toDS().toDF("doc_id", "text"), lineBase, outLine1,
      tmp("rc_lc1"), growLine1)
    val qS1 = NearDupStream.admissionStream(spark,
      inS1.toDS().toDF("doc_id", "text"), sigBase, outSig1,
      tmp("rc_sc1"), growSig1)
    val qP1 = PrefixDedupStream.admissionStream(spark,
      inP1.toDS().toDF("doc_id", "text"), pfxOrd, pfxDf, outPfx1,
      tmp("rc_pc1"))
    try {
      inL1.addData(batchA: _*); inS1.addData(batchA: _*)
      inP1.addData(batchA: _*)
      qL1.processAllAvailable(); qS1.processAllAvailable()
      qP1.processAllAvailable()
    } finally { qL1.stop(); qS1.stop(); qP1.stop() } // QUIESCE

    val admittedA = spark.read.parquet(outSig1)
      .filter(col("admit")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admittedA == Set(10L, 12L),
      s"phase-1 admission surprised the fixture: $admittedA")
    val curated = b0.unionByName(
      batchA.toDF("doc_id", "text")
        .filter(col("doc_id").isin(admittedA.toSeq: _*)))

    // ---- release into a fresh root; manifest = the one swap ----
    val root = tmp("rc_rel")
    val m = ReleaseBuild.release(spark, curated, lineBase, growLine1,
      sigBase, growSig1, root)
    assert(ReleaseBuild.readManifest(spark, root).contains(m))

    // ---- phase 2: restart EVERYTHING from the manifest ----
    val lineBase2 = spark.read.parquet(m.lineIndex)
    val sigBase2 = spark.read.parquet(m.signatureIndex)
    val pfxOrd2 = spark.read.parquet(m.prefixOrdered)
    val pfxDf2 = spark.read.parquet(m.prefixDf)
    val (growLine2, growSig2) = (tmp("rc_lg2"), tmp("rc_sg2"))
    val (outLine2, outSig2, outPfx2) =
      (tmp("rc_lo2"), tmp("rc_so2"), tmp("rc_po2"))
    val inL2 = MemoryStream[(Long, String)]
    val inS2 = MemoryStream[(Long, String)]
    val inP2 = MemoryStream[(Long, String)]
    val qL2 = LineDedupStream.admissionStream(spark,
      inL2.toDS().toDF("doc_id", "text"), lineBase2, outLine2,
      tmp("rc_lc2"), growLine2)
    val qS2 = NearDupStream.admissionStream(spark,
      inS2.toDS().toDF("doc_id", "text"), sigBase2, outSig2,
      tmp("rc_sc2"), growSig2)
    val qP2 = PrefixDedupStream.admissionStream(spark,
      inP2.toDS().toDF("doc_id", "text"), pfxOrd2, pfxDf2, outPfx2,
      tmp("rc_pc2"))
    // protocol step 3: the old growth dirs delete BEFORE batch B —
    // the restarted streams must be whole without them
    def rmrf(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
    }
    rmrf(growLine1); rmrf(growSig1)
    try {
      inL2.addData(batchB: _*); inS2.addData(batchB: _*)
      inP2.addData(batchB: _*)
      qL2.processAllAvailable(); qS2.processAllAvailable()
      qP2.processAllAvailable()
    } finally { qL2.stop(); qS2.stop(); qP2.stop() }

    // ---- the equivalence: batch B through the released artifacts
    // equals the single-corpus derivation, per artifact family ----
    def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq.toVector).toSet

    // LINE: the index remembers every line ever seen -> baseline is
    // buildIndex over base ∪ ALL of batch A
    val lineSingle = LineDedupStream.admitBatch(
      batchB.toDF("doc_id", "text"),
      LineDedupStream.buildIndex(
        b0.unionByName(batchA.toDF("doc_id", "text"))))
    val lineCols = Seq("doc_id", "n_lines", "n_kept", "kept_sig")
    assert(rows(spark.read.parquet(outLine2), lineCols: _*)
      == rows(lineSingle, lineCols: _*),
      "post-swap line stats diverge from the single-corpus derivation")

    // SIGNATURE: grows by admitted docs -> baseline is the curated
    // corpus's index
    val sigSingle = NearDupStream.admitBatch(
      batchB.toDF("doc_id", "text"),
      NearDupStream.buildBaseIndex(curated))
    val vCols = Seq("doc_id", "best_base", "jaccard_e4", "admit")
    val sigGot = rows(spark.read.parquet(outSig2), vCols: _*)
    assert(sigGot == rows(sigSingle, vCols: _*),
      "post-swap near-dup verdicts diverge from single-corpus")

    // PREFIX: re-derived from the curated corpus
    val (pfxOrdS, pfxDfS) = PrefixDedupStream.buildBaseIndex(curated)
    val pfxSingle = PrefixDedupStream.admitBatch(
      batchB.toDF("doc_id", "text"), pfxOrdS, pfxDfS)
    assert(rows(spark.read.parquet(outPfx2), vCols: _*)
      == rows(pfxSingle, vCols: _*),
      "post-swap prefix verdicts diverge from single-corpus")

    // KEEPER MAP: the released artifact equals re-derivation over the
    // curated corpus, and no cluster straddles a split
    val kmCols = Seq("doc_id", "keeper", "bucket", "split")
    val km = spark.read.parquet(m.keeperMap)
    assert(rows(km, kmCols: _*)
      == rows(IndexRebuild.rebuiltKeeperMap(curated), kmCols: _*),
      "released keeper map diverges from single-corpus re-derivation")
    assert(km.groupBy(col("keeper"))
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
      .isEmpty, "a cluster straddles a split in the released map")

    // ---- non-vacuity: the planted batch-B outcomes fired ----
    val verdictsB = spark.read.parquet(outSig2)
      .select("doc_id", "admit").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!verdictsB(20L),
      "near-copy of an A-ADMITTED doc must reject — the release " +
        "failed to carry batch A's admissions into the new base")
    assert(verdictsB(21L), "the fresh doc must admit")
    assert(!verdictsB(22L), "near-copy of a BASE doc must reject")
    val lineB = spark.read.parquet(outLine2)
      .select("doc_id", "n_kept").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lineB(23L) == 0L,
      "an exact line-copy of an A doc must keep zero lines — the " +
        "line growth was not compacted into the released index")
  }

  test("a fresh-checkpoint restart against a GROWN dir refuses " +
      "loudly instead of silently clobbering admitted digests") {
    // the hazard the rehearsal exposed: restart a growth stream with
    // a NEW checkpoint and the batch ids restart at 0 — batch=0
    // overwrites the oldest growth shard and the same-batch filter
    // hides the rest from the read. Under one checkpoint lineage a
    // replayed batch can never see LATER shard ids, so that state is
    // refusable (for dirs past their first shard — the honest limit
    // in Shards.requireNoLaterShards' doc).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val b0 = Seq((1L, "alpha\nbeta")).toDF("doc_id", "text")
    val lineBase = LineDedupStream.buildIndex(b0)
    val grow = tmp("rc_guard_g")
    val out1 = tmp("rc_guard_o1")
    val in1 = MemoryStream[(Long, String)]
    val q1 = LineDedupStream.admissionStream(spark,
      in1.toDS().toDF("doc_id", "text"), lineBase, out1,
      tmp("rc_guard_c1"), grow)
    try {
      in1.addData((10L, "gamma\ndelta")) // -> growth batch=0
      q1.processAllAvailable()
      in1.addData((11L, "epsilon"))      // -> growth batch=1
      q1.processAllAvailable()
    } finally q1.stop() // clean quiesce
    // WRONG restart: fresh checkpoint, same grown dir
    val in2 = MemoryStream[(Long, String)]
    val q2 = LineDedupStream.admissionStream(spark,
      in2.toDS().toDF("doc_id", "text"), lineBase, tmp("rc_guard_o2"),
      tmp("rc_guard_c2"), grow)
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      in2.addData((20L, "zeta"))
      q2.processAllAvailable()
      q2.awaitTermination()
    }
    q2.stop()
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")) ++ Iterator(""))
        .mkString(" | ")
    assert(rootMsg(e).contains("fresh checkpoint"),
      s"expected the guard's message, got: ${rootMsg(e)}")
    // nothing was clobbered: both phase-1 shards still hold their
    // digests (the guard fires BEFORE any write)
    val digests = spark.read.parquet(grow).select("lh")
      .collect().map(_.getString(0)).toSet
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(digests == Set(md5hex("gamma"), md5hex("delta"),
      md5hex("epsilon")), s"growth shards damaged: $digests")
    // the SANCTIONED restart — original checkpoint — still works is
    // LineDedupStreamSpec's crash-replay territory; the release
    // protocol's rebuilt-base + fresh-growth path is the main test's
  }
}
