package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch — the cardinality member of the
  * sketch family next to [[BloomBuild]] (membership) and [[CmsBuild]]
  * (frequency). m = 2^p byte registers replace an exact distinct
  * count: each key hashes to one register (low p bits) and a rank
  * (leading-zero run of the remaining bits, +1); the register keeps
  * the MAX rank seen. At 100 TB the win is the same fixed-state
  * story as CMS: distinct users/urls/ngrams over 10^11 rows in 2^p
  * bytes (128 B at p=7) where exact count-distinct shuffles every
  * key; the exchange carries one register array per task and merge
  * is elementwise max — commutative, associative, and IDEMPOTENT
  * (re-merging a partial cannot double-count, unlike CMS addition),
  * so the build is partitioning-independent byte-for-byte
  * (spec-asserted).
  *
  * Hashing rides the house md5-60-bit convention
  * (`HashUtil.md5Long60` of "hll:<key>", DuckDB twin `md5IntSql`),
  * so the oracle replays the register grid exactly: idx = h mod m,
  * w = h div m (60-p significant bits), rank rho = (61-p) -
  * bitlen(w) — all integer arithmetic both engines compute
  * identically. The estimator keeps that exactness: the harmonic
  * denominator sum(2^-rho) is accumulated as the INTEGER
  * sum(2^(61-p-rho)) scaled by 2^(61-p) (max m * 2^(61-p) = 2^61,
  * fits a long), and the float steps that remain — alpha, one
  * long->double round, one divide — are single correctly-rounded
  * IEEE ops both engines agree on bit-for-bit. A production tuning
  * would swap md5 for xxhash64 and 6-bit packed registers; this
  * layout buys SQL replayability, the house trade.
  */
object HllUtil {

  /** 60-bit house hash of a key, shared by build and oracle. */
  def hash(key: Long): Long =
    HashUtil.md5Long60(UTF8String.fromString(s"hll:$key"))

  def bitlen(w: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(w)

  /** Serialized layout: [p:int][registers: 2^p bytes]. */
  def toBytes(p: Int, regs: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + regs.length)
    bb.putInt(p).put(regs)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Array[Byte]) = {
    val bb = ByteBuffer.wrap(bytes)
    val p = bb.getInt
    val regs = new Array[Byte](1 << p)
    bb.get(regs)
    (p, regs)
  }

  /** The HLL cardinality estimate, floored to a long. Raw harmonic
    * estimator plus the standard small-range linear-counting
    * correction (E <= 2.5m with empty registers); the 60-bit hash
    * space needs no large-range correction at any realistic scale.
    */
  def cardinality(p: Int, regs: Array[Byte]): Long = {
    val m = 1 << p
    val rmax = 61 - p
    var z = 0L // sum of 2^(rmax - rho), exact: <= m * 2^rmax = 2^61
    var zeros = 0
    var j = 0
    while (j < m) {
      z += 1L << (rmax - regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    // alpha*m, *m, *2^rmax are exact doubles (power-of-two scales);
    // the only rounding is z.toDouble and the divide — both IEEE
    // correctly-rounded, so DuckDB reproduces the bits
    val raw = alpha * m * m * java.lang.Math.scalb(1.0, rmax) / z.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.floor(est).toLong
  }

  /** Register checksum sum((j+1) * rho_j) — a cheap exact witness
    * that every register byte matches the oracle's replay.
    */
  def regSum(p: Int, regs: Array[Byte]): Long = {
    var s = 0L
    var j = 0
    while (j < regs.length) { s += (j + 1).toLong * regs(j); j += 1 }
    s
  }
}

/** Mutable build buffer; the two-arg form adopts a deserialized
  * register array (same rationale as [[CmsBuffer]]).
  */
final class HllBuffer(val p: Int, val regs: Array[Byte]) {
  def this(p: Int) = this(p, new Array[Byte](1 << p))
  def add(key: Long): Unit = {
    val h = HllUtil.hash(key)
    val m = 1 << p
    val idx = (h % m).toInt
    val w = h / m
    val rho = (61 - p - HllUtil.bitlen(w)).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }
  def max(other: HllBuffer): Unit = {
    var j = 0
    while (j < regs.length) {
      if (other.regs(j) > regs(j)) regs(j) = other.regs(j)
      j += 1
    }
  }
}

/** `hll_build(key, <int literal p>)`: the serialized HLL sketch of a
  * group's BIGINT keys — 2^p byte registers. A true partial
  * aggregate: tasks fill local registers, the exchange carries one
  * register array per task, merge is elementwise max.
  */
case class HllBuild(key: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (p < 4 || p > 16)
      // 2^4 = the smallest grid with a published alpha; 2^16 = 64 KB
      // per task buffer, already far past any accuracy payoff
      TypeCheckResult.TypeCheckFailure(
        s"hll_build requires 4 <= p <= 16, got $p")
    else key.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_build requires a bigint key, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = key.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.max(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any =
    HllUtil.toBytes(buffer.p, buffer.regs)

  override def serialize(buffer: HllBuffer): Array[Byte] =
    HllUtil.toBytes(buffer.p, buffer.regs)

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val (p0, regs) = HllUtil.fromBytes(bytes)
    new HllBuffer(p0, regs)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllBuild =
    copy(key = newChildren(0))
}

/** `hll_card(sketch)`: the floored cardinality estimate of a
  * serialized HLL sketch. Plain scalar over the (tiny, per-group)
  * binary column — no broadcast machinery needed, unlike the
  * bloom/cms probes whose sketch is corpus-global.
  */
case class HllCard(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_card requires a binary sketch, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_card"

  override protected def nullSafeEval(input: Any): Any = {
    val (p, regs) = HllUtil.fromBytes(input.asInstanceOf[Array[Byte]])
    HllUtil.cardinality(p, regs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllCard.card($c)")

  override protected def withNewChildInternal(newChild: Expression): HllCard =
    copy(child = newChild)
}

object HllCard {
  def card(bytes: Array[Byte]): Long = {
    val (p, regs) = HllUtil.fromBytes(bytes)
    HllUtil.cardinality(p, regs)
  }
}

/** `hll_regsum(sketch)`: exact register checksum (see
  * [[HllUtil.regSum]]) — the oracle's witness that the whole grid,
  * not just the estimate, replayed identically.
  */
case class HllRegSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_regsum requires a binary sketch, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_regsum"

  override protected def nullSafeEval(input: Any): Any = {
    val (p, regs) = HllUtil.fromBytes(input.asInstanceOf[Array[Byte]])
    HllUtil.regSum(p, regs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllRegSum.sum($c)")

  override protected def withNewChildInternal(newChild: Expression): HllRegSum =
    copy(child = newChild)
}

object HllRegSum {
  def sum(bytes: Array[Byte]): Long = {
    val (p, regs) = HllUtil.fromBytes(bytes)
    HllUtil.regSum(p, regs)
  }
}

/** `hll_merge(sketch)`: re-aggregate STORED sketches to a coarser
  * grouping — the second half of the warehouse sketch pattern. The
  * nightly job persists per-(day, segment) sketches via
  * [[HllBuild]]; every later rollup (per-segment, per-month, global)
  * runs on the sketch TABLE — KBs — and never touches the raw 100 TB
  * again. Correct because register max is associative and
  * idempotent: merging per-segment grids yields byte-for-byte the
  * grid a direct build over the union of raw keys would produce
  * (spec-asserted, and the q96 oracle replays the direct build).
  *
  * The buffer starts empty (p unknown until the first sketch
  * arrives) and adopts the first input's geometry; mixing widths in
  * one group is a pipeline bug and fails fast rather than silently
  * estimating from a truncated grid. Empty groups (all-null input)
  * evaluate to null, like every built-in binary aggregate.
  */
case class HllMerge(sketch: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    sketch.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_merge requires a binary sketch, got ${other.catalogString}")
    }

  // p = -1 sentinel: no sketch absorbed yet
  override def createAggregationBuffer(): HllBuffer =
    new HllBuffer(-1, Array.emptyByteArray)

  private def absorb(buffer: HllBuffer, p: Int,
      regs: Array[Byte]): HllBuffer =
    if (buffer.p == -1) new HllBuffer(p, regs.clone())
    else if (buffer.p != p)
      throw new IllegalArgumentException(
        s"hll_merge: mixed sketch widths in one group " +
          s"(p=${buffer.p} vs p=$p) — rebuild the narrower side")
    else { buffer.max(new HllBuffer(p, regs)); buffer }

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = sketch.eval(input)
    if (v == null) buffer
    else {
      val (p, regs) = HllUtil.fromBytes(v.asInstanceOf[Array[Byte]])
      absorb(buffer, p, regs)
    }
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer =
    if (other.p == -1) buffer
    else absorb(buffer, other.p, other.regs)

  override def eval(buffer: HllBuffer): Any =
    if (buffer.p == -1) null
    else HllUtil.toBytes(buffer.p, buffer.regs)

  // empty-buffer round trip: zero bytes <-> the p = -1 sentinel
  override def serialize(buffer: HllBuffer): Array[Byte] =
    if (buffer.p == -1) Array.emptyByteArray
    else HllUtil.toBytes(buffer.p, buffer.regs)

  override def deserialize(bytes: Array[Byte]): HllBuffer =
    if (bytes.isEmpty) new HllBuffer(-1, Array.emptyByteArray)
    else {
      val (p0, regs) = HllUtil.fromBytes(bytes)
      new HllBuffer(p0, regs)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMerge =
    copy(sketch = newChildren(0))
}
