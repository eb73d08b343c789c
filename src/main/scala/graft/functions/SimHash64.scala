package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[SimHash64]]: the production-width 64-bit
  * SimHash of a token array in ONE pass — per token, four salted
  * 60-bit md5 hashes ("sh<limb>:" prefix, top 16 bits as the limb's
  * token hash, exactly [[graft.text.TextOps.tokenHashes16Limb]]),
  * votes accumulated into 64 counters, signature bit = vote sum > 0,
  * rendered as the same 16-hex string (limb 3 high). Value-identical
  * to the composed `withSimHash64` form (property-tested), which
  * paid 64 interpreted `aggregate` HOF passes per row plus four
  * materialized hash arrays — the q64/q37 CodegenFallback disease;
  * this is one codegen'd static call.
  */
object SimHashUtil {
  private val salts: Array[Array[Byte]] =
    (0 until 4).map(j => s"sh$j:".getBytes("UTF-8")).toArray

  def simhash64(arr: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      val tok = arr.getUTF8String(i)
      if (tok == null)
        throw new IllegalArgumentException(
          s"simhash64: null token at index $i — token arrays must be null-free")
      val tokBytes = tok.getBytes
      var j = 0
      while (j < 4) {
        val tv = (HashUtil.md5Long60Salted(salts(j), tokBytes) >>> 44).toInt
        var b = 0
        while (b < 16) {
          votes(j * 16 + b) += (if (((tv >> b) & 1) == 1) 1 else -1)
          b += 1
        }
        j += 1
      }
      i += 1
    }
    val out = new StringBuilder(16)
    var j = 3
    while (j >= 0) {
      var limb = 0
      var b = 0
      while (b < 16) {
        if (votes(j * 16 + b) > 0) limb |= 1 << b
        b += 1
      }
      out.append(f"$limb%04x")
      j -= 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** `simhash64(toks)`: 64-bit SimHash signature as 16 hex chars — the
  * q49 hot scalar, one codegen'd call per row. See [[SimHashUtil]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
