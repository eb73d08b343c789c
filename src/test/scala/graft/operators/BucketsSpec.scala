package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BucketsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("hot buckets are dropped before pairing; cold buckets pair fully") {
    import spark.implicits._
    // bucket 1: 3 rows (under cap) -> all 3 pairs
    // bucket 2: 5 rows (over cap 4) -> dropped entirely
    val rows = (1 to 3).map(i => (i.toLong, 1)) ++
      (10 to 14).map(i => (i.toLong, 2))
    val df = rows.toDF("vec_id", "bucket")
    val pairs = Buckets
      .cappedSelfJoinPairs(df, "vec_id", "bucket", maxBucket = 4)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("a cap that never binds leaves the pair set complete") {
    import spark.implicits._
    val df = (1 to 4).map(i => (i.toLong, 7)).toDF("vec_id", "bucket")
    val n = Buckets
      .cappedSelfJoinPairs(df, "vec_id", "bucket", maxBucket = 1000)
      .count()
    assert(n == 6) // C(4,2)
  }
}
