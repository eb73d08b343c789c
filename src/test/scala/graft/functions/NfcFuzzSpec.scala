package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck fuzz of [[NfcUtil.nfc]] against `java.text.Normalizer`
  * directly. The full-path delegation is shared code, so what this
  * actually fuzzes is the part that is NOT shared: the two
  * hand-written fast paths (the ASCII byte-scan short-circuit and the
  * `isNormalized` skip) and the UTF8String <-> String round-trip —
  * i.e. the claims "the short-circuit never fires on a string NFC
  * would change" and "re-encoding never corrupts". Generators lean on
  * the adversarial regions: combining-mark streaks, Hangul jamo,
  * compatibility precomposites, astral-plane codepoints.
  *
  * Seeded: every run replays the identical case stream.
  */
class NfcFuzzSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(42L)),
      p)
    assert(res.passed, res.status.toString)
  }

  // valid scalar codepoints only (no lone surrogates): UTF8String
  // cannot represent unpaired surrogates, and parquet/UTF-8 corpus
  // strings cannot contain them either — they are out of the domain
  private val genCodepoint: Gen[Int] = Gen.frequency(
    4 -> Gen.choose(0x20, 0x7E),         // ASCII
    3 -> Gen.choose(0xC0, 0x2FF),        // Latin-1..IPA precomposites
    3 -> Gen.choose(0x300, 0x36F),       // combining diacritics
    2 -> Gen.choose(0x1100, 0x11FF),     // Hangul conjoining jamo
    1 -> Gen.choose(0xAC00, 0xD7A3),     // precomposed Hangul syllables
    1 -> Gen.choose(0x1E00, 0x1EFF),     // Latin extended additional
    1 -> Gen.choose(0xFB00, 0xFB4F),     // presentation ligatures
    1 -> Gen.oneOf(0x0, 0x1F, 0x7F),     // control chars
    1 -> Gen.choose(0x10000, 0x10FFF))   // astral plane (surrogate pairs)

  private val genString: Gen[String] =
    Gen.listOf(genCodepoint).map(cps =>
      new String(cps.toArray, 0, cps.length))

  private val genAscii: Gen[String] =
    Gen.listOf(Gen.choose(0x0, 0x7F)).map(cps =>
      new String(cps.toArray, 0, cps.length))

  test("agrees with java.text.Normalizer NFC on arbitrary valid unicode") {
    check(Prop.forAll(genString) { s =>
      NfcUtil.nfc(UTF8String.fromString(s)).toString ==
        Normalizer.normalize(s, Normalizer.Form.NFC)
    }, n = 2000)
  }

  test("idempotent: nfc(nfc(s)) == nfc(s)") {
    check(Prop.forAll(genString) { s =>
      val once = NfcUtil.nfc(UTF8String.fromString(s))
      NfcUtil.nfc(once).toString == once.toString
    })
  }

  test("ASCII short-circuit returns the SAME instance (no allocation)") {
    check(Prop.forAll(genAscii) { s =>
      val u = UTF8String.fromString(s)
      NfcUtil.nfc(u) eq u
    })
  }

  test("already-normalized non-ASCII input returns the same instance") {
    // the isNormalized skip: composed text must not pay a re-encode
    check(Prop.forAll(genString) { s =>
      val composed = Normalizer.normalize(s, Normalizer.Form.NFC)
      val u = UTF8String.fromString(composed)
      NfcUtil.nfc(u) eq u
    })
  }

  test("normalization preserves NFC-equivalence class (never changes meaning)") {
    // decomposing first must land on the same normal form
    check(Prop.forAll(genString) { s =>
      val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
      NfcUtil.nfc(UTF8String.fromString(nfd)).toString ==
        NfcUtil.nfc(UTF8String.fromString(s)).toString
    })
  }
}
