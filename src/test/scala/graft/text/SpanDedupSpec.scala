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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cuts(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    TextOps.cutSharedSpans(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
  }

  test("cut: whole-doc copy collapses to empty, the smaller id keeps everything") {
    val d = toks("c", 30).mkString(" ")
    val got = cuts(Seq(1L -> d, 2L -> d))
    assert(got(1L) == ((30L, 0L, md5hex(d))), s"keeper must be untouched: $got")
    assert(got(2L) == ((30L, 30L, md5hex(""))), s"copy must be fully cut: $got")
  }

  test("cut: partial share removes exactly the span, kept text is the remainder") {
    val src = toks("s", 30)
    val shared = src.slice(5, 21) // 16 tokens
    val copy = Seq("x0", "x1") ++ shared ++ Seq("x2")
    val got = cuts(Seq(1L -> src.mkString(" "), 2L -> copy.mkString(" ")))
    assert(got(1L)._2 == 0L, s"lower id keeps its copy: $got")
    assert(got(2L) == ((19L, 16L, md5hex("x0 x1 x2"))),
      s"higher id loses exactly the 16 borrowed tokens: $got")
  }

  test("cut: three-doc cluster keeps exactly one copy corpus-wide") {
    val d = toks("k", 25).mkString(" ")
    val got = cuts(Seq(5L -> d, 9L -> d, 11L -> d))
    assert(got(5L)._2 == 0L && got(9L)._2 == 25L && got(11L)._2 == 25L,
      s"only the lowest id survives: $got")
  }

  test("cut: overlapping spans from different partners union, not double-count") {
    // doc 3 borrows s0..s19 from doc 1 and s10..s29 from doc 2 as one
    // contiguous 30-token text equal to doc 1+2's overlap structure:
    // covered positions union to all 30, n_cut stays <= n_toks
    val a = toks("s", 20)                 // s0..s19
    val b = toks("s", 30).drop(10)        // s10..s29
    val whole = toks("s", 30)             // s0..s29
    val got = cuts(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" "),
      3L -> whole.mkString(" ")))
    assert(got(3L) == ((30L, 30L, md5hex(""))),
      s"union coverage must cut all 30 once: $got")
  }

  test("intra-doc repetition alone does not count as a shared span") {
    val rep = toks("r", 12)
    val got = spans(Seq(
      1L -> (rep ++ toks("m", 5) ++ rep).mkString(" "),
      2L -> toks("n", 30).mkString(" ")))
    assert(got(1L) == 0 && got(2L) == 0, got.toString)
  }
}
