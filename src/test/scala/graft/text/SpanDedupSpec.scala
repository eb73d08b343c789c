package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TextOps.maxSharedSpans]] — the suffix-style substring-dedup
  * measurement (q85): longest cross-doc shared token run per doc.
  */
class SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def spans(docs: Seq[(Long, String)],
      maxOcc: Int = 8): Map[Long, Long] = {
    import spark.implicits._
    TextOps.maxSharedSpans(docs.toDF("doc_id", "text"), maxOcc = maxOcc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // distinct token vocabularies so nothing matches by accident
  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("misaligned partial share is found token-exactly (alignment-free)") {
    val src = toks("s", 30)                       // s0..s29
    val shared = src.slice(5, 21)                 // 16 tokens at offset 5
    val copy = Seq("x0", "x1") ++ shared ++ Seq("x2") // same 16 at offset 2
    val got = spans(Seq(1L -> src.mkString(" "), 2L -> copy.mkString(" "),
      3L -> toks("z", 25).mkString(" ")))
    assert(got(1L) == 16 && got(2L) == 16, s"expected 16/16: $got")
    assert(got(3L) == 0, s"unrelated doc must report 0: $got")
  }

  test("whole-doc copy reports the full doc length") {
    val d = toks("w", 40).mkString(" ")
    val got = spans(Seq(1L -> d, 2L -> d))
    assert(got(1L) == 40 && got(2L) == 40, got.toString)
  }

  test("span below the shingle width is invisible; at the width it is seen") {
    val a = toks("a", 20); val b = toks("b", 20)
    // 7 shared tokens: no 8-gram matches -> 0
    val got7 = spans(Seq(
      1L -> (a ++ b.take(7)).mkString(" "),
      2L -> (b.take(7) ++ toks("c", 13)).mkString(" ")))
    assert(got7(1L) == 0 && got7(2L) == 0, got7.toString)
    // 8 shared tokens: exactly one matching shingle -> span 8
    val got8 = spans(Seq(
      1L -> (a ++ b.take(8)).mkString(" "),
      2L -> (b.take(8) ++ toks("c", 12)).mkString(" ")))
    assert(got8(1L) == 8 && got8(2L) == 8, got8.toString)
  }

  test("two docs sharing two runs report the LONGER one") {
    val r1 = toks("p", 10); val r2 = toks("q", 24)
    val d1 = (r1 ++ toks("f", 9) ++ r2).mkString(" ")
    val d2 = (r2 ++ toks("g", 9) ++ r1).mkString(" ")
    val got = spans(Seq(1L -> d1, 2L -> d2))
    assert(got(1L) == 24 && got(2L) == 24, got.toString)
  }

  test("hot shingles past maxOcc are dropped: deterministic lower bound") {
    // ten docs all carrying the same 16-token span: every span shingle
    // occurs 10x > maxOcc=8 -> dropped before pair generation, spans
    // report 0 (the documented guard against boilerplate blowup) …
    val shared = toks("h", 16)
    val docs = (1L to 10L).map(i =>
      i -> (Seq(s"u${i}a", s"u${i}b") ++ shared).mkString(" "))
    assert(spans(docs).values.forall(_ == 0L))
    // … and a raised cap sees them again
    assert(spans(docs, maxOcc = 16).values.forall(_ == 16L))
  }

  test("intra-doc repetition alone does not count as a shared span") {
    val rep = toks("r", 12)
    val got = spans(Seq(
      1L -> (rep ++ toks("m", 5) ++ rep).mkString(" "),
      2L -> toks("n", 30).mkString(" ")))
    assert(got(1L) == 0 && got(2L) == 0, got.toString)
  }
}
