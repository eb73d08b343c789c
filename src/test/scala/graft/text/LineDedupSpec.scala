package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TextOps.lineDedup]] (q150) — C4-style corpus-wide line dedup
  * with keep-first semantics, on a hand corpus where every keeper is
  * known. `kept_sig` = md5 over the kept lines' md5s joined by '\n'
  * in position order (text never shuffles; the signature carries the
  * same content+order evidence).
  */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def sig(lines: Seq[String]): String =
    md5hex(lines.map(md5hex).mkString("\n"))

  private val emptySig = md5hex("")

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    TextOps.lineDedup(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("keep-first across docs, within-doc repeats dropped") {
    val got = run(Seq(
      1L -> "a\nb\nc",
      2L -> "b\nd",
      3L -> "a\na\ne",
      4L -> "a\nb"))
    assert(got(1L) === ((3L, 3L, sig(Seq("a", "b", "c")))),
      "the first doc owns all its lines")
    assert(got(2L) === ((2L, 1L, sig(Seq("d")))),
      "'b' was kept at (1,1); only 'd' survives")
    assert(got(3L) === ((3L, 1L, sig(Seq("e")))),
      "both 'a' occurrences lose to (1,0) — within-doc repeat included")
    assert(got(4L) === ((2L, 0L, emptySig)),
      "a fully-deduped doc keeps the empty signature")
  }

  test("kept signature preserves original line order, not hash order") {
    val got = run(Seq(
      10L -> "z\nm\na",
      11L -> "m"))
    assert(got(10L)._3 === sig(Seq("z", "m", "a")))
    assert(got(10L)._3 !== sig(Seq("a", "m", "z")),
      "the signature must be order-sensitive")
    assert(got(11L) === ((1L, 0L, emptySig)))
  }

  test("keep-first tie rule is the smallest doc_id, then position") {
    val got = run(Seq(
      7L -> "x\ny",
      5L -> "y\nx")) // doc 5 wins both despite listing order
    assert(got(5L) === ((2L, 2L, sig(Seq("y", "x")))))
    assert(got(7L) === ((2L, 0L, emptySig)))
  }

  test("rank-key packing bound fails LOUD, never silently mis-orders") {
    // pos bound: a doc whose line count reaches LineKeyPosBound would
    // collide rank keys with the NEXT doc_id — the guard must throw,
    // not return wrong keepers. Exactly-at-bound (pos == 1e6) trips.
    val atBound = Seq(0L ->
      Array.fill((TextOps.LineKeyPosBound + 1).toInt)("u").mkString("\n"))
    val e1 = intercept[Exception] { run(atBound) }
    assert(e1.toString.contains("rank_key") ||
      Option(e1.getCause).exists(_.toString.contains("rank_key")) ||
      e1.toString.toLowerCase.contains("assert"),
      s"expected the loud guard, got: $e1")
    // one line below the bound is fine
    val under = run(Seq(0L -> Array.fill(3)("v").mkString("\n")))
    assert(under(0L)._2 === 1L)
    // doc_id bound: packing overflows Long past Long.Max/bound
    val bigId = Long.MaxValue / TextOps.LineKeyPosBound
    val e2 = intercept[Exception] { run(Seq(bigId -> "w")) }
    assert(e2.toString.toLowerCase.contains("assert") ||
      e2.toString.contains("rank_key") ||
      Option(e2.getCause).exists(_.toString.contains("rank_key")),
      s"expected the loud guard, got: $e2")
    // negative doc_id would sort BEFORE every valid key — also loud
    val e3 = intercept[Exception] { run(Seq(-1L -> "q")) }
    assert(e3 != null)
  }
}
