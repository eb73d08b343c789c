package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding — the multi-dimensional clustering
  * primitive behind data-layout optimization: sorting/range-
  * partitioning a table by the interleaved bits of two quantized
  * dimensions keeps rows that are close in BOTH dimensions close in
  * file order, so per-file min/max statistics prune scans for
  * predicates on EITHER dimension (the trick Delta's OPTIMIZE ZORDER
  * and Iceberg's sort orders apply; at 100 TB, layout is the
  * difference between reading one file and reading them all).
  *
  * Pure integer Column arithmetic (shift/mask/add over disjoint
  * bits) — whole-stage codegen'd, engine-portable, oracle-checkable
  * bit-for-bit.
  */
object ZOrder {

  /** The Morton code of two `bits`-bit non-negative ints: x's bit b
    * lands at position 2b, y's at 2b+1. Disjoint targets, so the
    * combine is a plain sum.
    */
  def zOrderCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(1).cast("long") * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(1).cast("long") * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Quantize a double in [lo, hi] onto a 2^bits integer grid
    * (clamped), the step before interleaving.
    */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val cells = (1L << bits).toDouble
    least(lit((1L << bits) - 1),
      greatest(lit(0L), floor((v - lo) * cells / (hi - lo)).cast("long")))
  }

  /** Range-partition + sort `df` by the Morton code of two quantized
    * double dimensions — the write-side layout step: each output
    * partition covers a compact Z-curve segment, so files carry tight
    * min/max on BOTH source columns.
    */
  def zOrderBy(df: DataFrame, xCol: Column, xLo: Double, xHi: Double,
      yCol: Column, yLo: Double, yHi: Double, bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    val code = zOrderCode(
      quantize(xCol, xLo, xHi, bits).cast("int"),
      quantize(yCol, yLo, yHi, bits).cast("int"), bits)
    val withCode = df.withColumn("__z", code)
    val parted =
      if (partitions > 0) withCode.repartitionByRange(partitions, col("__z"))
      else withCode.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
