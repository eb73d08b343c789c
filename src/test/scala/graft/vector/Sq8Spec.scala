package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[VectorOps.sqEncode]]/[[VectorOps.sqDecode]] — int8 scalar
  * quantization (q149): code range, reconstruction error bound, and
  * the zero-dimension guard.
  */
class Sq8Spec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def roundTrip(vs: Seq[Seq[Double]], scales: Seq[Double])
      : (Seq[Seq[Int]], Seq[Seq[Double]]) = {
    import spark.implicits._
    val sc = array(scales.map(lit(_)): _*)
    val df = vs.toDF("v")
      .select(VectorOps.sqEncode(col("v"), sc).as("c"))
      .withColumn("dv", VectorOps.sqDecode(col("c"), sc))
      .collect()
    (df.map(_.getSeq[Int](0)).toSeq, df.map(_.getSeq[Double](1)).toSeq)
  }

  test("codes stay in int8 range and reconstruction error is bounded") {
    val vs = Seq(
      Seq(1.0, -0.5, 0.25, 0.0),
      Seq(-1.0, 0.5, -0.25, 0.0),
      Seq(0.999, -0.499, 0.001, 0.0))
    val scales = Seq(1.0, 0.5, 0.25, 1.0)
    val (codes, dvs) = roundTrip(vs, scales)
    for ((cs, i) <- codes.zipWithIndex; (c, d) <- cs.zipWithIndex) {
      assert(c >= -127 && c <= 127, s"code $c out of int8 range")
      val err = math.abs(dvs(i)(d) - vs(i)(d))
      assert(err <= scales(d) / 254.0 + 1e-12,
        s"reconstruction error $err exceeds half-step for dim $d")
    }
    // extremes hit the rails exactly
    assert(codes.head.head === 127)
    assert(codes(1).head === -127)
  }

  test("an all-zero dimension quantizes to 0, not NaN") {
    val (codes, dvs) = roundTrip(Seq(Seq(0.0, 1.0)), Seq(0.0, 1.0))
    assert(codes.head.head === 0)
    assert(dvs.head.head === 0.0)
    assert(!dvs.head.exists(_.isNaN))
  }

  test("decode(encode(x)) is idempotent on already-quantized values") {
    // values exactly on the grid k·scale/127 must round-trip exactly
    val scales = Seq(2.0)
    val vs = Seq(-127, -50, 0, 50, 127).map(k => Seq(k * 2.0 / 127.0))
    val (codes, dvs) = roundTrip(vs, scales)
    assert(codes.map(_.head) === Seq(-127, -50, 0, 50, 127))
    for ((v, dv) <- vs.zip(dvs))
      assert(math.abs(dv.head - v.head) < 1e-15)
  }
}
