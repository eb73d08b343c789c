package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The replica embedding perturbation (ScaleBench.perturbEmbedding):
  * orthogonality (norms preserved) and twin-freedom past the rotation
  * period — the r13 ADVICE finding that replicas k and k+Dim carried
  * identical embeddings at factor > Dim.
  */
class ScaleBenchSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dim = graft.queries.VectorQueries.Dim

  // a fixed, norm-1-ish deterministic vector: v(j) = sin(j+1)
  private def base: Seq[Double] = (0 until dim).map(j => math.sin(j + 1.0))

  private def perturbed(k: Int): Array[Double] = {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(base)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    df.select(ScaleBench.perturbEmbedding(k, col("embedding")).as("e"))
      .head().getSeq[Double](0).toArray
  }

  test("perturbation preserves the norm exactly (orthogonal transform)") {
    val n0 = math.sqrt(base.map(x => x * x).sum)
    for (k <- Seq(0, 1, 63, 64, 65, 99, 127, 128)) {
      val v = perturbed(k)
      assert(v.length == dim)
      val nk = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nk - n0) < 1e-12, s"norm drifted at k=$k")
    }
  }

  test("replicas k and k+Dim are no longer identical (r13 ADVICE)") {
    // the pure rotation repeated with period Dim; the Walsh phase must
    // break it for every k in the recorded 100x sweep's range
    for (k <- 0 until 64 by 7) {
      val a = perturbed(k)
      val b = perturbed(k + dim)
      assert(!a.sameElements(b), s"k=$k and k=${k + dim} identical")
      // and the two differ by sign flips only (same rotation) — the
      // composition is rotation-then-sign, so |a| == |b| elementwise
      assert(a.zip(b).forall { case (x, y) =>
        math.abs(math.abs(x) - math.abs(y)) < 1e-15 })
    }
  }

  test("first 100 replicas are pairwise distinct (sweep-sized twin-freedom)") {
    val all = (0 until 100).map(k => perturbed(k).toSeq)
    assert(all.distinct.size == 100)
  }
}
