package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[DeflateLen]]: the DEFLATE-compressed size of a
  * string's UTF-8 bytes, via the JDK's built-in zlib
  * (`java.util.zip.Deflater`, default level — no dependency). The
  * compressed BYTES are discarded; only the length survives, so the
  * expression allocates nothing per row beyond what zlib itself needs:
  * one thread-local Deflater reset per call and one thread-local
  * scratch buffer the counting loop drains into.
  *
  * Why a length and not the bytes: the compression RATIO
  * (raw/compressed) is a standard corpus-quality signal — CCNet-style
  * pipelines flag highly compressible documents as repetitive
  * boilerplate and incompressible ones as binary/encrypted junk. At
  * 100 TB the signal must be computed in the scan (map-only, no
  * shuffled payloads), which is exactly what a codegen'd scalar gives.
  *
  * Determinism: zlib's output for a given (input, level) is stable on
  * a JVM; the engine never compares raw lengths across engines — q132
  * thresholds the ratio with wide closed-form margins, and the spec
  * pins an inflate round-trip rather than golden byte counts.
  */
object DeflateUtil {
  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def deflateLen(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `deflate_len(<string>)`: compressed size (bytes, zlib default
  * level) of the string's UTF-8 encoding, as a long. NULL in, NULL
  * out; the empty string compresses to zlib's 8-byte empty stream,
  * not 0.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateUtil.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateUtil.deflateLen($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLen = copy(child = newChild)
}
