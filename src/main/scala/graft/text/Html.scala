package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/boilerplate main-content extraction — the CCNet/RefinedWeb
  * front door: real crawl curation starts from HTML, not clean text,
  * and the first operator is tag stripping + boilerplate removal
  * (nav bars, footers, menus) + main-content selection.
  *
  * The pipeline is the jusText-shaped block heuristic, expressed as
  * pure Column combinators (codegen'd end to end, zero UDFs):
  *   1. drop <script>/<style> elements wholesale (their TEXT is code,
  *      not content);
  *   2. segment on block-level tags (div/p/nav/footer/...) — inline
  *      markup (<a>, <b>) stays inside its block;
  *   3. score each block: visible text length after tag stripping +
  *      whitespace collapse, and LINK DENSITY via the block's <a>
  *      count;
  *   4. keep blocks with >= [[MinBlockChars]] visible chars AND at
  *      least [[CharsPerLink]] chars per link (navigation chrome is
  *      short and link-dense; body text is long and link-sparse);
  *   5. the main content is the kept blocks joined in document order.
  *
  * Regex parity note (the oracle mirrors this pipeline in DuckDB/RE2
  * while Spark compiles java.util.regex): every pattern below stays
  * inside the syntax/semantics intersection of the two engines —
  * literal tags, `[^>]*`, non-greedy `.*?` under `(?s)`, and PLAIN
  * SPACE collapse (`" +"`, never `\s`, whose class differs between
  * the engines at \x0B). Callers feeding organic text into planted
  * HTML sanitize it to the ASCII-printable subset first (q142 does),
  * which makes space the only whitespace either engine ever sees.
  *
  * 100 TB posture: map-only — one pass over the html column, no
  * shuffle, no UDF; the per-row cost is a few regex passes over the
  * document (the same order as the q34/q35 text scoring family).
  */
object Html {

  /** Block-level segmentation tags (opening or closing, any attrs). */
  val BlockTagPattern: String =
    "</?(?:html|head|title|body|div|p|h[1-6]|li|ul|ol|nav|footer|header|section|article|aside|td|th|tr|table|br)[^>]*>"

  private val NoisePattern =
    "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"

  /** Minimum visible characters for a block to be content. */
  val MinBlockChars = 25

  /** Minimum visible characters PER LINK (link-density gate):
    * a block with n links needs n * this many chars to survive.
    */
  val CharsPerLink = 40

  /** Remove script/style elements wholesale. */
  def stripNoise(html: Column): Column =
    regexp_replace(html, NoisePattern, " ")

  /** Visible text of one block: tags to spaces, runs of spaces
    * collapsed, trimmed.
    */
  private def visible(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), " +", " "))

  /** Link count of one block (<a> openings surviving in the block). */
  private def linkCount(b: Column): Column =
    size(split(b, "<a ")) - 1

  /** Extract main content from an html column. Returns a struct:
    *   - content: kept blocks' visible text joined in document order
    *   - n_blocks: blocks with any visible text
    *   - n_kept: blocks that passed the content gate
    */
  def extractMain(html: Column): Column = {
    val blocks = split(stripNoise(html), BlockTagPattern)
    val vis = transform(blocks, visible(_))
    val kept = filter(
      transform(blocks, b =>
        when(length(visible(b)) >= MinBlockChars &&
          length(visible(b)) >= linkCount(b) * CharsPerLink,
          visible(b))),
      _.isNotNull)
    struct(
      array_join(kept, " ").as("content"),
      size(filter(vis, v => length(v) > 0)).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }
}
