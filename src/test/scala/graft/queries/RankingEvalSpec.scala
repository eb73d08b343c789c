package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q147 — retrieval-quality eval (recall/MRR/NDCG@10 by label) on a
  * hand-built fixture where the exact ranking is known by
  * construction: unit vectors at increasing angles from the single
  * query vector, so cosine rank order == id order and every metric
  * is computable by hand from the pinned integer weight table.
  */
class RankingEvalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("rankeval").toString
    // vec_id 0 is the only panel query (vec_id % 100 == 0); ids 1..11
    // sit at strictly increasing angles -> cosine to v0 strictly
    // decreasing -> exact rank of id i is i. Labels: 1, 3, 5 share
    // the query's label (relevant at ranks 1, 3, 5); rest differ.
    val rows = (0 to 11).map { i =>
      val theta = i * 0.1
      val v = Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
      val label = if (i == 0 || i == 1 || i == 3 || i == 5) 7 else 9
      Row(i.toLong, v.toSeq, label)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("weight table is the pinned round(1e6/log2(r+1)) sequence") {
    assert(VectorQueries.DcgWeightsE6.head === 1000000L)
    assert(VectorQueries.DcgWeightsE6(2) === 500000L) // r=3: log2(4)=2
    assert(VectorQueries.DcgWeightsE6 === VectorQueries.DcgWeightsE6.sorted.reverse,
      "weights must be monotonically decreasing")
    assert(VectorQueries.DcgPrefixE6.head === 0L)
    assert(VectorQueries.DcgPrefixE6.last === VectorQueries.DcgWeightsE6.sum)
  }

  test("metrics on the constructed ranking match the hand computation") {
    val out = graft.SparkEntry.queries("q147_ranking_eval")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    val w = VectorQueries.DcgWeightsE6
    val ps = VectorQueries.DcgPrefixE6
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Long]("hits") === 3L, "ranks 1, 3, 5 are relevant")
    assert(r.getAs[Long]("recall_e6") === 1000000L)
    assert(r.getAs[Long]("mrr_e6") === 1000000L, "first relevant at rank 1")
    val dcg = w(0) + w(2) + w(4)
    val expNdcg = math.round(10000.0 * dcg / ps(3))
    assert(r.getAs[Long]("ndcg_e4") === expNdcg)
    assert(r.getAs[Long]("ndcg_e4") < 10000L,
      "relevant at 1,3,5 with n_rel=3 is not a perfect ranking")
  }
}
