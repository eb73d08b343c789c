package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Runtime helper for [[RepStats2]]: one pass over a token array
  * counting its adjacent 2-grams (tokens joined by a single space —
  * byte-identical to `concat_ws(" ", slice(toks, i, 2))`) into a hash
  * map, then folding the counts to the Gopher repetition signals:
  * total 2-gram occurrences, the top gram's count, and the count of
  * occurrences belonging to any repeated gram. Null token slots fail
  * fast (split() output never has them) rather than silently
  * diverging.
  */
object RepUtil {
  def repStats2(arr: ArrayData): InternalRow = {
    val len = arr.numElements()
    if (len < 2) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, java.lang.Long](len * 2)
    var i = 0
    while (i < len - 1) {
      if (arr.isNullAt(i) || arr.isNullAt(i + 1))
        throw new IllegalArgumentException(
          s"rep_stats2: null token at index $i — token arrays must be null-free")
      val g = arr.getUTF8String(i).toString + " " +
        arr.getUTF8String(i + 1).toString
      counts.merge(g, 1L, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any]((len - 1).toLong, top, dup))
  }
}

/** `rep_stats2(toks)`: per-row 2-gram repetition statistics as
  * struct<n_2grams, top_c, dup_c> — the q64 hot scalar. The
  * composed form (sort the gram array, fold its runs with a HOF
  * `aggregate`) is CodegenFallback: interpreted lambda dispatch and a
  * fresh struct per element per row measurably dominated q64 (3.1 s
  * of a 3.1 s query at sf0.1). This is one static call per row
  * inside whole-stage codegen, one hash map, no intermediate arrays.
  * Values are identical — a run length in the sorted array IS the
  * gram's count (property-tested against a driver-side reference).
  */
case class RepStats2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_stats2 requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_2grams", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("dup_c", LongType, nullable = false)))
  override def prettyName: String = "rep_stats2"

  override protected def nullSafeEval(input: Any): Any =
    RepUtil.repStats2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepUtil.repStats2($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats2 =
    copy(child = newChild)
}
