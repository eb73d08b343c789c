package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.vector.VectorOps._

class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("dot and cosine against hand-computed values") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0))).toDF("a", "b")
    val d = df.select(dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(d == 1.0 * 4 - 2 * 5 + 3 * 6)
    val c = df.select(cosine(col("a"), col("a"))).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val orth = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(orth.select(cosine(col("a"), col("b"))).collect().head.getDouble(0) == 0.0)
  }

  test("srpSigns: deterministic, correct shape, roughly balanced") {
    val s1 = srpSigns(8, 64)
    val s2 = srpSigns(8, 64)
    assert(s1 == s2)
    assert(s1.length == 8 && s1.forall(_.length == 64))
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    val pos = s1.flatten.count(_ > 0)
    assert(pos > 150 && pos < 360) // md5 parity should be near-uniform
  }

  test("srpBucket: in range, sign-flip of a vector flips every plane") {
    import spark.implicits._
    val signs = srpSigns(8, 4)
    val df = Seq(Seq(0.3, -1.2, 0.7, 2.0), Seq(-0.3, 1.2, -0.7, -2.0))
      .toDF("v")
    val bs = df.select(srpBucket(col("v"), signs)).collect().map(_.getInt(0))
    assert(bs.forall(b => b >= 0 && b < 256))
    // negation flips every projection's sign -> bitwise complement
    assert((bs(0) ^ bs(1)) == 255)
  }
}
