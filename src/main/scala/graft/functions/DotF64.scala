package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Runtime helper for [[DotF64]]: the sequential multiply-add fold
  * `acc = acc + a(i)*b(i)`, left to right from 0.0 — the EXACT FP op
  * sequence of `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` and of
  * DuckDB's `list_sum` over the product list (both verified
  * bit-identical ON NULL-FREE ARRAYS — the only shape an embedding
  * column has), so swapping the HOF form for this one changes no
  * oracle-checked value. Mismatched lengths and null ELEMENTS fail
  * loud: in this engine every embedding column is fixed-dim and
  * null-free, so either is a pipeline bug, not data. (The HOF fold
  * would propagate NULL for a null element; silently reading it as
  * 0.0 — what a bare getDouble does — is the one divergence this
  * guard closes.)
  */
object VecUtil {
  def dotF64(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_f64: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_f64: null element at index $i — embedding arrays must be null-free")
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }
}

/** Native Catalyst expression (with codegen) for the double dot
  * product — the hot scalar of the similarity-search path (§2.11).
  * The higher-order `aggregate`/`zip_with` composition it replaces is
  * CodegenFallback in Spark: every row pays interpreted lambda
  * dispatch per element, plus the materialized product array. This is
  * one static call per row inside whole-stage codegen, a tight
  * primitive loop, no intermediate array.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f64 requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dotF64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecUtil.dotF64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}
