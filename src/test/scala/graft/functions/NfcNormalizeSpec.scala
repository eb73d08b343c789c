package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** All non-ASCII test data is written as explicit \u escapes so the
  * composed/decomposed distinction survives any editor or formatter
  * touching this file (raw bytes would be invisible-identical on
  * screen).
  */
class NfcNormalizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val eAcute = "\u00E9"       // precomposed
  private val eCombining = "e\u0301"  // e + combining acute

  private def nfcOf(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(call_function("nfc_normalize", col("t")).as("n"))
      .head().getString(0)
  }

  test("composes decomposed sequences to precomposed form") {
    assert(nfcOf(eCombining) == eAcute)
    assert(nfcOf(s"r${eCombining}sum$eCombining") == s"r${eAcute}sum$eAcute")
    // Hangul: conjoining jamo U+1100 U+1161 compose to syllable U+AC00
    assert(nfcOf("\u1100\u1161") == "\uAC00")
  }

  test("pure ASCII short-circuits to the identity") {
    val s = "plain ascii text, unchanged 123"
    assert(nfcOf(s) == s)
  }

  test("already-NFC non-ASCII text is unchanged") {
    val s = s"caf$eAcute \u00FCber stra\u00DFe"
    assert(nfcOf(s) == s)
  }

  test("null propagates, empty string stays empty") {
    import spark.implicits._
    val out = Seq(Option(""), None: Option[String]).toDF("t")
      .select(call_function("nfc_normalize", col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("", null))
  }

  test("interpreted eval agrees with codegen") {
    // eval() on a standalone expression is the interpreted path; the
    // projection in nfcOf runs the codegen'd one
    val viaEval = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(eCombining),
        org.apache.spark.sql.types.StringType)).eval(null).toString
    assert(viaEval == eAcute)
    assert(nfcOf(eCombining) == viaEval)
  }

  test("the planted q95 prefixes normalize to one canonical form") {
    // q95's oracle depends on these two byte-different prefixes
    // canonicalizing identically after NFC + lower + space collapse;
    // pin it in-JVM so a Normalizer behavior change fails loudly
    // here rather than as a driver hash mismatch
    import spark.implicits._
    val canon = Seq(
        "R\u00C9SUM\u00C9  Caf\u00E9 x",
        "re\u0301sume\u0301 cafe\u0301 x")
      .toDF("t")
      .select(regexp_replace(
        trim(lower(call_function("nfc_normalize", col("t")))),
        "\\s+", " ").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(canon.distinct.size == 1,
      s"prefixes did not canonicalize together: $canon")
    assert(canon.head == s"r${eAcute}sum$eAcute caf$eAcute x")
  }
}
