package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Html.extractMain as q61's optional front stage: curating the
  * EXTRACTED text of boilerplate-wrapped pages must decide exactly
  * what curating the clean text decides — same keep/drop, same
  * reasons, same keeper/split — because extraction recovers the
  * content blocks verbatim (inputs pre-normalized to the collapsed
  * ASCII form extraction emits).
  */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def wrap(text: String): String =
    "<html><head><title>T</title><style>p{x:1}</style>" +
      "<script>var a=1;</script></head><body>" +
      "<nav><a href=\"/h\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<div>menu 3</div>" +
      s"<p>$text</p>" +
      "<footer><a href=\"/c\">Contact</a> (c) 7</footer></body></html>"

  // clean, pre-collapsed ASCII texts (>= MinBlockChars so the content
  // gate keeps them); doc 4 duplicates doc 1 (the dup rule must fire),
  // doc 5 is stopword-free gibberish (the lang/quality rules see it)
  private val texts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "a measurement of the data pipeline is worth a thousand guesses",
    3L -> "le renard brun rapide saute par dessus le chien paresseux oui",
    4L -> "the quick brown fox jumps over the lazy dog again and again",
    5L -> "zxqj vwpk rrtl mmnn ooqq ssdd ffgg hhjj kkll zzxx ccvv bbnn")

  test("curate(extract(html)) == curate(clean) row for row") {
    val clean = texts.toDF("doc_id", "text")
    val pages = texts.map { case (id, t) => (id, wrap(t)) }
      .toDF("doc_id", "html")
    val extracted = pages.select(col("doc_id"),
      Html.extractMain(col("html")).getField("content").as("text"))
    // extraction recovered the content verbatim…
    assert(extracted.orderBy("doc_id").as[(Long, String)].collect()
      .toSeq == texts)
    // …so the curation verdicts coincide exactly
    val a = graft.queries.TextQueries.curate(clean)
      .orderBy("doc_id").collect().toSeq
    val b = graft.queries.TextQueries.curate(extracted)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // sanity: the fixture exercises the dup branch
    assert(a.exists(_.getAs[String]("reason") == "dup"))
  }

  test("boilerplate never leaks: script/style/nav/footer text absent") {
    val page = wrap("content long enough to pass the block gate easily")
    val out = Seq(Tuple1(page)).toDF("html")
      .select(Html.extractMain(col("html")).getField("content"))
      .head().getString(0)
    for (bad <- Seq("var a=1", "p{x:1}", "Home", "About", "Contact", "menu"))
      assert(!out.contains(bad), s"boilerplate leaked: $bad")
    assert(out == "content long enough to pass the block gate easily")
  }

  private def extract(page: String): String =
    Seq(Tuple1(page)).toDF("html")
      .select(Html.extractMain(col("html")).getField("content"))
      .head().getString(0)

  test("entities decode single-pass, ASCII range, after tag strip") {
    val out = extract("<html><body><p>A &amp;lt; B &#65;&#x42; " +
      "&quot;q&quot; &apos; &nbsp; C &#8217; D &bad; " +
      "plus padding words here</p></body></html>")
    // single-pass: &amp;lt; becomes the literal text "&lt;", NEVER
    // "<" (chained replaces would double-decode); numeric dec+hex
    // decode inside 32..126; &#8217; (out of ASCII) and &bad;
    // (unknown) pass through untouched; &nbsp; merges into the
    // whitespace collapse
    assert(out === "A &lt; B AB \"q\" ' C &#8217; D &bad; " +
      "plus padding words here")
  }

  test("comments never leak; CDATA payload is kept as text") {
    val out = extract("<html><body>" +
      "<!-- <p>leaked comment content should never appear</p> -->" +
      "<p>before <![CDATA[inside <b>kept</b> raw]]> after padding " +
      "padding</p></body></html>")
    assert(!out.contains("leaked"))
    assert(out === "before inside kept raw after padding padding")
  }

  test("quoted attributes containing '>' and uppercase tags") {
    val out = extract("<HTML><BODY><DIV DATA-X=\"a > b\">menu of " +
      "links</DIV><P CLASS='y > z'>real paragraph content with " +
      "enough characters to pass</P></BODY></HTML>")
    assert(out ===
      "real paragraph content with enough characters to pass")
    assert(!out.contains("\">"), "quoted-attr tail leaked as text")
  }

  test("a stray '<' not opening a tag stays text") {
    val out = extract("<html><body><p>we know 2<3 and 5<7 in this " +
      "long enough sentence</p></body></html>")
    assert(out === "we know 2<3 and 5<7 in this long enough sentence")
  }

  test("script with '>' in attrs and spaced close still drops whole") {
    val out = extract("<html><body><SCRIPT type=\"a>b\">var x='y';" +
      "</script ><p>only the paragraph with plenty of visible " +
      "characters</p></body></html>")
    assert(!out.contains("var x"))
    assert(out ===
      "only the paragraph with plenty of visible characters")
  }

  test("link-dense long block is dropped by the chars-per-link gate") {
    val linky = (1 to 6).map(i =>
      s"""<a href="/$i">item number $i</a>""").mkString(" ")
    val page = s"<html><body><div>$linky</div>" +
      "<p>the one real paragraph with plenty of visible characters</p>" +
      "</body></html>"
    val out = Seq(Tuple1(page)).toDF("html")
      .select(Html.extractMain(col("html")).getField("content"))
      .head().getString(0)
    assert(out == "the one real paragraph with plenty of visible characters")
  }
}
