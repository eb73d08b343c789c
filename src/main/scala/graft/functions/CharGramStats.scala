package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[CharGramStats]]: one pass over a string's
  * UTF-8 bytes computing the md5 of every sliding n-CODEPOINT gram —
  * semantically identical to `transform(sequence(1, length-n+1),
  * i -> md5(substr(text, i, n)))` folded to (min, distinct-count),
  * but without the per-gram substring scan (substr restarts its
  * codepoint walk from byte 0, making the composed form O(len^2)
  * per doc), the materialized gram array, or the per-gram hex
  * strings. Byte offsets of codepoint boundaries are walked once;
  * each gram hashes its byte slice in place. The minimum is tracked
  * on raw digests (unsigned byte order == lowercase-hex
  * lexicographic order, so the final hex render equals
  * `array_min` of the hex grams); distinct digests live in one
  * per-row hash set.
  */
object GramUtil {
  private val HexChars = "0123456789abcdef".toCharArray

  def charGramStats(text: UTF8String, n: Int): InternalRow = {
    val bytes = text.getBytes
    // codepoint boundary offsets via Spark's OWN stride rule
    // (UTF8String.numBytesForFirstByte — the walk numChars/substring
    // use): on well-formed UTF-8 this equals a continuation-byte
    // scan, and on MALFORMED input it must still match `length()`/
    // `substr()` so the fingerprint equals the composed form on
    // dirty corpora too (a leading byte advances its declared width
    // even when the bytes that follow are not continuations)
    var chars = 0
    var i = 0
    while (i < bytes.length) {
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    if (chars < n) return new GenericInternalRow(Array[Any](null, 0L))
    val offsets = new Array[Int](chars + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      offsets(k) = i; k += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offsets(chars) = bytes.length

    val digest = HashUtil.mdInstance()
    val seen = new java.util.HashSet[java.nio.ByteBuffer](chars * 2)
    var min: Array[Byte] = null
    var g = 0
    while (g <= chars - n) {
      val from = offsets(g)
      // a malformed tail can stride past the end; clamp like
      // UTF8String.substring does
      val until = math.min(offsets(g + n), bytes.length)
      digest.reset()
      digest.update(bytes, from, until - from)
      val d = digest.digest()
      seen.add(java.nio.ByteBuffer.wrap(d))
      if (min == null || unsignedLess(d, min)) min = d
      g += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(hex(min)), seen.size().toLong))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }
}

/** `char_gram_stats(text, <int literal n>)`: the q37 hot scalar —
  * struct<fingerprint, n_distinct> of a doc's sliding character
  * n-grams under md5, computed in one codegen'd static call per row.
  * The composed HOF form (sequence + transform + array_min +
  * array_distinct) evaluated the gram array per output column,
  * re-scanned the string per substr, and materialized every hex
  * digest; this is the [[RepStats2]] treatment applied to q37
  * (measured 8.6 s -> 0.6 s at sf0.1; the intermediate fix that only
  * de-duplicated the double evaluation still measured 4.2 s).
  * Values are identical — property-tested against the composed form.
  */
case class CharGramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1 || n > 64)
      TypeCheckResult.TypeCheckFailure(
        s"char_gram_stats requires 1 <= n <= 64, got $n")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_gram_stats requires a string, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", StringType, nullable = true),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "char_gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramUtil.charGramStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramUtil.charGramStats($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharGramStats = copy(child = newChild)
}
