package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("zOrderCode: golden interleavings") {
    import spark.implicits._
    // morton(3, 5): x=011 -> bits 0,2 at even slots = 1+4;
    // y=101 -> bits 0,2 at odd slots = 2+32 -> 39
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (1023, 1023))
      .toDF("x", "y")
      .select(ZOrder.zOrderCode(col("x"), col("y"), 10))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, (1L << 20) - 1))
  }

  test("quantize: clamps below/above and hits the full grid") {
    import spark.implicits._
    val got = Seq(-200.0, -90.0, 0.0, 89.99, 90.0, 200.0).toDF("v")
      .select(ZOrder.quantize(col("v"), -90, 90, 10))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got(1) == 0L)
    assert(got(2) == 512L)
    assert(got(3) == 1023L && got(4) == 1023L && got.last == 1023L)
  }

  test("zOrderBy: partitions cover disjoint, contiguous Z-curve segments") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(2000)((rnd.nextDouble() * 180 - 90,
      rnd.nextDouble() * 360 - 180)).toDF("lat", "lon")
    val laid = ZOrder.zOrderBy(pts, col("lat"), -90, 90,
      col("lon"), -180, 180, bits = 10, partitions = 8)
    // recompute the code per row and check each partition holds one
    // non-overlapping zcode interval — the property min/max pruning
    // needs from the written files
    val ranges = laid
      .withColumn("z", ZOrder.zOrderCode(
        ZOrder.quantize(col("lat"), -90, 90, 10).cast("int"),
        ZOrder.quantize(col("lon"), -180, 180, 10).cast("int"), 10))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == 2000)
    assert(ranges.length > 1, "expected multiple range partitions")
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2, s"partition zcode ranges overlap: $ranges")
      case _ =>
    }
  }
}
