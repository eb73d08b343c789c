package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[Md5Long60]]: md5 the UTF-8 bytes and take the
  * first 15 hex nibbles (60 bits) as a non-negative long — EXACTLY the
  * value of `conv(substring(md5(s), 1, 15), 16, 10)`, the engine's
  * cross-engine-portable base hash (DuckDB replays it from the hex
  * form). Computing it from the digest bytes skips the 32-char hex
  * string materialization and the string-based base conversion that
  * the built-in-function composition pays per shingle.
  */
object HashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def long60(d: Array[Byte]): Long =
    // first 8 bytes big-endian = 16 nibbles; drop the 16th -> 60 bits
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4

  def md5Long60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    long60(digest.digest(s.getBytes))
  }

  /** The thread-local MD5 instance, reset and ready — shared with the
    * sibling native scalars ([[GramUtil]]) so the digest-lifecycle
    * code exists once.
    */
  private[functions] def mdInstance(): MessageDigest = {
    val d = md.get()
    d.reset()
    d
  }

  /** md5Long60 of `prefix ++ bytes` without building the concatenated
    * string — the salted hash-family form ([[SimHashUtil]]'s four
    * limbs): identical to `md5Long60(UTF8String(prefix + s))` because
    * md5 streams its input.
    */
  def md5Long60Salted(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    digest.update(prefix)
    long60(digest.digest(bytes))
  }

  /** All word n-gram shingle hashes of a token array, in order: the
    * 60-bit md5 of each window's tokens joined by a single space —
    * byte-identical to `md5(concat_ws(" ", slice(toks, i, n)))`, but
    * STREAMED into one digest instance (update per token + separator)
    * with zero intermediate shingle strings. Empty array when fewer
    * than n tokens, matching TextOps.wordShingles' guard. Tokens must
    * be non-null (split() output always is); a null element fails fast
    * rather than silently diverging from concat_ws's null-skipping.
    */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val digest = md.get()
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      digest.reset()
      var j = i
      while (j < i + n) {
        if (j > i) digest.update(0x20.toByte)
        digest.update(toks(j))
        j += 1
      }
      out(i) = long60(digest.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression (with codegen) for the 60-bit md5 base
  * hash — the hot scalar of the near-dup digest stage (SURVEY §2.11).
  * Same value as `conv(substring(md5(s), 1, 15), 16, 10)`; a single
  * static call per row inside whole-stage codegen, no hex string.
  */
case class Md5Long60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long60 requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.md5Long60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Long60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

/** Native shingle-hash expression: `shingle_hash60(toks, n)` maps a
  * token array to the 60-bit md5 of every n-token window (space-
  * joined), replacing the transform+slice+concat_ws+md5 composition —
  * the measured hot spot of the near-dup digest stage was the
  * per-shingle string materialization, not the md5 itself. One static
  * call per row inside whole-stage codegen; the digest streams over
  * token bytes with no intermediate shingle strings.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** Session wiring for the engine's native functions. Call once per
  * SparkSession (Verify/Bench/tests do); queries reach the functions
  * via `call_function("md5_long60", col)` /
  * `call_function("shingle_hash60", toks, lit(n))`.
  */
object GraftFunctions {
  private val shingleBuilder: Seq[Expression] => Expression = {
    case Seq(toks, Literal(n: Int, IntegerType)) => ShingleHash60(toks, n)
    case other => throw new IllegalArgumentException(
      s"shingle_hash60(toks, <int literal>) — got $other")
  }

  private val md5Builder: Seq[Expression] => Expression = {
    case Seq(s) => Md5Long60(s)
    case other => throw new IllegalArgumentException(
      s"md5_long60(<string>) takes exactly one argument — got ${other.length}")
  }

  private[functions] val nfcBuilder: Seq[Expression] => Expression = {
    case Seq(s) => NfcNormalize(s)
    case other => throw new IllegalArgumentException(
      s"nfc_normalize(<string>) takes exactly one argument — " +
        s"got ${other.length}")
  }

  private val deflateBuilder: Seq[Expression] => Expression = {
    case Seq(s) => DeflateLen(s)
    case other => throw new IllegalArgumentException(
      s"deflate_len(<string>) takes exactly one argument — got ${other.length}")
  }

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotF64(a, b)
    case other => throw new IllegalArgumentException(
      s"dot_f64(<array<double>>, <array<double>>) takes exactly two " +
        s"arguments — got ${other.length}")
  }

  private val topkBuilder: Seq[Expression] => Expression = {
    case Seq(score, id, Literal(k: Int, IntegerType)) => TopKByScore(score, id, k)
    case other => throw new IllegalArgumentException(
      s"topk_by_score(score, id, <int literal k>) — got $other")
  }

  private[functions] val collectMembersBuilder: Seq[Expression] => Expression = {
    case Seq(id, nsh, Literal(c: Long, LongType)) =>
      CollectMembersCapped(id, nsh, c)
    case Seq(id, nsh, Literal(c: Int, IntegerType)) =>
      CollectMembersCapped(id, nsh, c.toLong)
    case other => throw new IllegalArgumentException(
      s"collect_members_capped(doc_id, n_sh, <integral literal cap>) — " +
        s"got $other")
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "md5_long60", md5Builder, "built-in")
    registry.createOrReplaceTempFunction(
      "shingle_hash60", shingleBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "dot_f64", dotBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "topk_by_score", topkBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "collect_members_capped", collectMembersBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "rep_stats2", repStatsBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "bloom_build", bloomBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "cms_build", cmsBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "hll_build", hllBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "hll_merge", hllMergeBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "hll_card", hllCardBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "hll_regsum", hllRegSumBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "char_gram_stats", charGramBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", simHash64Builder, "built-in")
    registry.createOrReplaceTempFunction(
      "nfc_normalize", nfcBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "deflate_len", deflateBuilder, "built-in")
  }

  private val bloomBuilder: Seq[Expression] => Expression = {
    case Seq(key, Literal(m: Int, IntegerType), Literal(k: Int, IntegerType)) =>
      BloomBuild(key, m, k)
    case other => throw new IllegalArgumentException(
      s"bloom_build(key, <int literal mBits>, <int literal k>) — got $other")
  }

  private[functions] val cmsBuilder: Seq[Expression] => Expression = {
    case Seq(key, Literal(w: Int, IntegerType), Literal(d: Int, IntegerType)) =>
      CmsBuild(key, w, d)
    case other => throw new IllegalArgumentException(
      s"cms_build(key, <int literal w>, <int literal d>) — got $other")
  }

  private[functions] val hllBuilder: Seq[Expression] => Expression = {
    case Seq(key, Literal(p: Int, IntegerType)) => HllBuild(key, p)
    case other => throw new IllegalArgumentException(
      s"hll_build(key, <int literal p>) — got $other")
  }

  private[functions] val hllMergeBuilder: Seq[Expression] => Expression = {
    case Seq(sk) => HllMerge(sk)
    case other => throw new IllegalArgumentException(
      s"hll_merge(<binary sketch>) takes exactly one argument — " +
        s"got ${other.length}")
  }

  private[functions] val hllCardBuilder: Seq[Expression] => Expression = {
    case Seq(sk) => HllCard(sk)
    case other => throw new IllegalArgumentException(
      s"hll_card(<binary sketch>) takes exactly one argument — " +
        s"got ${other.length}")
  }

  private[functions] val hllRegSumBuilder: Seq[Expression] => Expression = {
    case Seq(sk) => HllRegSum(sk)
    case other => throw new IllegalArgumentException(
      s"hll_regsum(<binary sketch>) takes exactly one argument — " +
        s"got ${other.length}")
  }

  private[functions] val charGramBuilder: Seq[Expression] => Expression = {
    case Seq(text, Literal(n: Int, IntegerType)) => CharGramStats(text, n)
    case other => throw new IllegalArgumentException(
      s"char_gram_stats(text, <int literal n>) — got $other")
  }

  private[functions] val simHash64Builder: Seq[Expression] => Expression = {
    case Seq(toks) => SimHash64(toks)
    case other => throw new IllegalArgumentException(
      s"simhash64(<array<string>>) takes exactly one argument — " +
        s"got ${other.length}")
  }

  private val repStatsBuilder: Seq[Expression] => Expression = {
    case Seq(toks) => RepStats2(toks)
    case other => throw new IllegalArgumentException(
      s"rep_stats2(<array<string>>) takes exactly one argument — " +
        s"got ${other.length}")
  }
}

/** Standard extension hook: users of the library outside our own
  * mains get the native functions with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the idiomatic
  * SparkSessionExtensions injection path.
  */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => Md5Long60(s)
        case other => throw new IllegalArgumentException(
          s"md5_long60(<string>) takes exactly one argument — got ${other.length}")
      }))
    ext.injectFunction((FunctionIdentifier("shingle_hash60"),
      new ExpressionInfo(classOf[ShingleHash60].getName, "shingle_hash60"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks, Literal(n: Int, IntegerType)) => ShingleHash60(toks, n)
        case other => throw new IllegalArgumentException(
          s"shingle_hash60(toks, <int literal>) — got $other")
      }))
    ext.injectFunction((FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotF64(a, b)
        case other => throw new IllegalArgumentException(
          s"dot_f64(<array<double>>, <array<double>>) takes exactly two " +
            s"arguments — got ${other.length}")
      }))
    ext.injectFunction((FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(score, id, Literal(k: Int, IntegerType)) =>
          TopKByScore(score, id, k)
        case other => throw new IllegalArgumentException(
          s"topk_by_score(score, id, <int literal k>) — got $other")
      }))
    ext.injectFunction((FunctionIdentifier("collect_members_capped"),
      new ExpressionInfo(classOf[CollectMembersCapped].getName,
        "collect_members_capped"),
      GraftFunctions.collectMembersBuilder))
    ext.injectFunction((FunctionIdentifier("rep_stats2"),
      new ExpressionInfo(classOf[RepStats2].getName, "rep_stats2"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks) => RepStats2(toks)
        case other => throw new IllegalArgumentException(
          s"rep_stats2(<array<string>>) takes exactly one argument — " +
            s"got ${other.length}")
      }))
    ext.injectFunction((FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuild].getName, "bloom_build"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(key, Literal(m: Int, IntegerType), Literal(k: Int, IntegerType)) =>
          BloomBuild(key, m, k)
        case other => throw new IllegalArgumentException(
          s"bloom_build(key, <int literal mBits>, <int literal k>) — got $other")
      }))
    ext.injectFunction((FunctionIdentifier("cms_build"),
      new ExpressionInfo(classOf[CmsBuild].getName, "cms_build"),
      GraftFunctions.cmsBuilder)) // one builder, both injection paths
    ext.injectFunction((FunctionIdentifier("hll_build"),
      new ExpressionInfo(classOf[HllBuild].getName, "hll_build"),
      GraftFunctions.hllBuilder))
    ext.injectFunction((FunctionIdentifier("hll_merge"),
      new ExpressionInfo(classOf[HllMerge].getName, "hll_merge"),
      GraftFunctions.hllMergeBuilder))
    ext.injectFunction((FunctionIdentifier("hll_card"),
      new ExpressionInfo(classOf[HllCard].getName, "hll_card"),
      GraftFunctions.hllCardBuilder))
    ext.injectFunction((FunctionIdentifier("hll_regsum"),
      new ExpressionInfo(classOf[HllRegSum].getName, "hll_regsum"),
      GraftFunctions.hllRegSumBuilder))
    ext.injectFunction((FunctionIdentifier("char_gram_stats"),
      new ExpressionInfo(classOf[CharGramStats].getName, "char_gram_stats"),
      GraftFunctions.charGramBuilder))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      GraftFunctions.simHash64Builder))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      GraftFunctions.nfcBuilder))
  }
}
