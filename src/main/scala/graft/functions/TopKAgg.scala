package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: parallel arrays sorted by
  * (score DESC, id ASC), never more than k entries. Insertion is a
  * backward scan + shift — k is single digits in every use, so this
  * beats any heap on constants and allocates nothing per row.
  */
final class TopKLongBuffer(val k: Int) {
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def beats(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Long, id: Long): Unit = {
    var pos = n
    while (pos > 0 && beats(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    if (pos >= k) return // worse than a full buffer's tail
    var i = math.min(n, k - 1) // last slot shifts off when full
    while (i > pos) { scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1 }
    scores(pos) = score
    ids(pos) = id
    if (n < k) n += 1
  }
}

/** `topk_by_score(score, id, k)`: the k (score DESC, id ASC)-best
  * (id, score) pairs per group, as a SORTED array<struct<id,score>>
  * — a real partial aggregate, which is the whole point: each task
  * keeps a k-slot buffer per group and the shuffle carries at most k
  * rows per (task, group), where the `row_number() OVER (PARTITION BY
  * group)` formulation it replaces exchanges and sorts EVERY scored
  * row. For q40's brute-force cosine baseline that window was the one
  * quadratic-at-scale stage left (n x q scored rows through one
  * exchange+sort); with this aggregate the full scored table never
  * leaves the mappers. Plans as ObjectHashAggregate (partial + final).
  *
  * Scores and ids are BIGINT — the engine's rank surfaces are rounded
  * e6 integers precisely so ordering is engine-portable; a generic
  * any-type top-k would re-open the cross-engine FP-ordering hole.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLongBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score requires k > 0, got $k")
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score requires (bigint score, bigint id), got " +
          s"${s.catalogString} and ${i.catalogString}")
    }

  override def createAggregationBuffer(): TopKLongBuffer = new TopKLongBuffer(k)

  override def update(buffer: TopKLongBuffer, input: InternalRow): TopKLongBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKLongBuffer, other: TopKLongBuffer): TopKLongBuffer = {
    var j = 0
    while (j < other.n) { buffer.insert(other.scores(j), other.ids(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKLongBuffer): Any = {
    val out = new Array[Any](buffer.n)
    var j = 0
    while (j < buffer.n) {
      out(j) = new GenericInternalRow(
        Array[Any](buffer.ids(j), buffer.scores(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.n)
    bb.putInt(buffer.k).putInt(buffer.n)
    var j = 0
    while (j < buffer.n) {
      bb.putLong(buffer.scores(j)).putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new TopKLongBuffer(bb.getInt)
    val n = bb.getInt
    var j = 0
    // already sorted: appends in order, no shifting
    while (j < n) {
      val s = bb.getLong
      val i = bb.getLong
      buffer.insert(s, i)
      j += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
