package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The r13 verdict's audit-fixture gap, closed: the five ANN audits
  * (q105 SRP recall, q126 IVF probe depth, q128 PQ/ADC, q123
  * alignment, q135 hard negatives) all read ~the banding collision
  * floor on the gate's RANDOM embeddings — true neighbors are barely
  * more aligned than chance there, so a recall regression above the
  * floor was invisible. This spec runs the UNCHANGED audit queries
  * against a deterministic CLUSTERED fixture (20 well-separated
  * centroids, members = centroid + 0.15·perturbation, label-mixed
  * clusters so different-label neighbors are real) where approximate
  * recall is genuinely high, and PINS each audit's measured number in
  * a range — the regression tripwire the random gate cannot provide.
  *
  * Geometry: same-cluster cosines sit near 1/(1+eps²) ≈ 0.96+ while
  * cross-cluster cosines are near 0, so every exact top-3 is
  * same-cluster and the SRP/IVF/PQ approximations must find them.
  * All constants are integer-hash derived (no RNG) — the fixture is
  * bit-identical on every run and JVM.
  */
class ClusteredRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val N = 2000
  private val Dim = 64
  private val Clusters = 20
  private val Eps = 0.3

  /** Deterministic uniform double in [-1, 1) from an integer —
    * splitmix64 finalizer, NOT an affine hash mod p: an affine hash
    * makes different members' perturbation vectors differ by a
    * CONSTANT vector (modulo wrap), which correlates the whole
    * fixture's geometry (measured: same-cluster cos 0.42 where the
    * orthogonal-perturbation model predicts 0.67, and cross-member
    * cosines inflated enough to pin every alignment margin under the
    * 1.4 bar). The finalizer's avalanche restores independence.
    */
  private def h(x: Long): Double = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4B9FBL
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11) / (1L << 53).toDouble * 2 - 1
  }

  /** Write a clustered embeddings dir; `label(i)` picks the label
    * policy — MIXED ((i/20) % 10: every cluster holds all labels, so
    * different-label true neighbors exist — q135's regime) or PURE
    * (cluster % 10: cross-side neighborhoods are cross-cluster, so a
    * planted twin DOMINATES its margin neighborhood — the regime
    * margin mining (q118/q122/q123) is built for; on mixed clusters
    * the dense same-cluster cross-side neighbors push every margin
    * toward 1 and the exact aligner CORRECTLY admits nothing).
    */
  private def writeClustered(clusters: Int, label: Int => Int,
      eps: Double): String = {
    val d = java.nio.file.Files
      .createTempDirectory("clustered-embeddings").toString
    import spark.implicits._
    val rows = (0 until N).map { i =>
      val k = i % clusters
      val v = Array.tabulate(Dim) { dd =>
        (h(k.toLong * Dim + dd) + eps * h(1000000L + i.toLong * Dim + dd))
          .toFloat
      }
      (i.toLong, v, label(i))
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val dir: String =
    writeClustered(Clusters, i => (i / Clusters) % 10, Eps)
  // q123's regime: label-pure clusters, looser geometry, and a
  // cluster count COPRIME with the twin stride (47 vs every-50th) so
  // twins spread one-or-two per cluster. All three matter: the
  // margin test (>= 1.4) compares the twin's cosine against its
  // top-4 neighborhood means, and (a) tight clusters put 0.9-cos
  // siblings in the x-side mean, (b) label-mixed clusters put
  // same-cluster members on the far side, (c) a stride-aligned
  // cluster count concentrates ALL twins in 2 clusters, flooding the
  // b-side with near-copies — each alone pins every margin under
  // the bar (the audit CORRECTLY admitting nothing). K=47/eps=0.8
  // admits every planted twin at margins 1.46-1.68 (measured
  // offline), with clusters still real: same-cluster cos ~0.61
  // >> cross ~0.1.
  private lazy val dirPure: String =
    writeClustered(47, i => (i % 47) % 10, 0.8)

  private def avgRecallE6(df: org.apache.spark.sql.DataFrame,
      filterCfg: Option[String] = None): Double = {
    val base = filterCfg.fold(df)(c => df.filter(col("cfg") === c))
    base.agg(avg(col("recall_e6"))).head().getDouble(0)
  }

  test("q105 SRP recall is far above the random-gate collision floor") {
    val df = graft.queries.VectorQueries.q105(spark, dir)
    df.persist(); df.count()
    val srp8 = avgRecallE6(df, Some("srp8"))
    val band = avgRecallE6(df, Some("band3x8"))
    df.unpersist()
    info(s"measured srp8=$srp8 band3x8=$band")
    // random-gate floors: srp8 ~7%, band3x8 ~13%. On clustered
    // geometry banding must buy real recall; measured 2026-08: srp8
    // 0.18e6, band3x8 0.80e6 — pinned with margin for plane-count
    // sensitivity, still well above the floors (and the band/srp gap
    // is exactly the multi-table story the audit exists to tell)
    assert(srp8 >= 120000, s"srp8 clustered recall degraded: $srp8")
    assert(band >= 600000, s"band3x8 clustered recall degraded: $band")
    assert(band > srp8, "banding must dominate the single table")
  }

  test("q126 IVF probe-2 recall is high and dominates probe-1") {
    val df = graft.queries.VectorQueries.q126(spark, dir)
    df.persist(); df.count()
    val r = df.agg(avg(col("recall_p1_e6")), avg(col("recall_p2_e6")))
      .head()
    df.unpersist()
    val (p1, p2) = (r.getDouble(0), r.getDouble(1))
    info(s"measured probe1=$p1 probe2=$p2")
    // measured 2026-08: probe1 0.37e6, probe2 0.63e6 — the second
    // probe's marginal recall is real on clustered geometry
    assert(p2 >= 450000, s"probe-2 clustered recall degraded: $p2")
    assert(p2 >= p1, "the second probe cannot lose recall")
  }

  test("q128 PQ/ADC recall is high on small-cluster geometry") {
    // PQ's informative regime is ITS OWN: on tight big clusters ADC
    // quantization error exceeds the within-cluster neighbor gaps and
    // recall CORRECTLY collapses toward the 0.13e6 random floor
    // (measured 0.12e6 at eps=0.3, 0.28e6 at eps=0.8) — a real
    // property of PQ, not a regression. Clusters of FOUR (500
    // clusters, so the exact top-3 is exactly the 3 siblings at
    // cos ~0.7 against ~0.1 cross) separate neighbors beyond the
    // quantization error, which is precisely what ADC can rank
    // (measured 2026-08: 0.78e6 — 6x the floor).
    val dirPq = writeClustered(500, i => i % 10, 0.65)
    val r = avgRecallE6(graft.queries.VectorQueries.q128(spark, dirPq))
    info(s"measured pq=$r")
    assert(r >= 400000, s"PQ/ADC small-cluster recall degraded: $r")
  }

  test("q123 banded alignment recall clears the random-gate reading") {
    // label-PURE clusters: margin mining needs the true pair to
    // dominate its cross-side neighborhood (see writeClustered)
    val df = graft.queries.VectorQueries.q123(spark, dirPure)
    val rows = df.collect()
    info(rows.map(_.toString).mkString(" | "))
    val shipped = rows.find(_.getAs[String]("cfg") == "band3x8c")
      .getOrElse(fail(s"cfgs: ${rows.map(_.getAs[String]("cfg")).toSeq}"))
    assert(shipped.getAs[Long]("n_exact") > 0,
      "fixture must make the exact aligner admit pairs, or recall is vacuous")
    // measured 2026-08: every config finds all 22 exact pairs
    // (recall 1.0e6); the shipped confirm config is also junk-free
    // (precision 1.0e6 vs band3x8's 0.12e6)
    val recall = shipped.getAs[Long]("recall_e6")
    assert(recall >= 900000,
      s"shipped alignment config's clustered recall degraded: $recall")
  }

  test("q135 hard-negative recall is far above the 13% random floor") {
    // measured 2026-08: 0.74e6 on label-mixed clusters (different-
    // label true neighbors are real here) vs the 13% random floor
    val r = avgRecallE6(graft.queries.VectorQueries.q135(spark, dir))
    info(s"measured hardneg=$r")
    assert(r >= 500000, s"hard-negative clustered recall degraded: $r")
  }
}
