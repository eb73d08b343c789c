package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[NfcNormalize]]: Unicode canonical composition
  * (NFC). Web corpora mix composed and decomposed encodings of the
  * SAME text (é vs e+U+0301 — crawlers, OCR, and Mac filesystems all
  * disagree), which silently defeats every digest-keyed operator in
  * the engine: exact dedup (q30), chunk/span dedup, MinHash — two
  * byte-different encodings of one string hash apart. NFC before
  * hashing is the standard fix (Unicode TR#15; DuckDB ships it as
  * `nfc_normalize`, which oracles this expression bit-for-bit).
  *
  * Cost posture: the dominant corpus case is pure-ASCII text, which
  * NFC cannot change — detected with a byte scan (no allocation, no
  * Normalizer call). Non-ASCII already-NFC text (the next most
  * common: most UTF-8 on the web IS composed) pays one
  * `isNormalized` scan; only genuinely decomposed text pays the
  * normalize + re-encode.
  */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: NFC is the identity
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression (with codegen): `nfc_normalize(str)` —
  * Unicode NFC canonical composition, the normalization gate in
  * front of the digest-keyed dedup family. A single static call per
  * row inside whole-stage codegen; ASCII rows short-circuit on a
  * byte scan. Named after its DuckDB twin so the SQL oracles read
  * identically.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
