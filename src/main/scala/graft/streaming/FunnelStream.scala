package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the continuous twin of the q97 batch
  * funnel (`queries/Relational.scala` q97): per user, the first time
  * each ORDERED stage was reached, where stage k counts only STRICTLY
  * after that user's stage k-1 time (a click at the exact view
  * timestamp does not convert — q97's rule).
  *
  * Why not fold stages on arrival order: event time and arrival order
  * disagree in a real stream — the view that qualifies a click can
  * arrive a batch later. Correct-by-watermark instead (the AsOfStream
  * pattern): events buffer per user in `flatMapGroupsWithState` and
  * fold into the stage state only once the watermark passes their
  * event time. At that point no in-watermark event that could precede
  * them can still arrive, so folding in event-time order is exact:
  * stage k's time is the FIRST eligible stage-k event in event-time
  * order — identical to the batch running-window-min formulation
  * (spec-asserted at sf0.01, shuffled arrival order included).
  *
  * A user's funnel row is emitted when their event stream goes idle:
  * an event-time timeout fires once the watermark passes the user's
  * last event + `idleGapMs` — the row is final because every
  * still-admissible event (>= watermark) would be later than
  * everything folded. Late stragglers beyond the watermark are
  * dropped by Spark's late-row filter (append-mode semantics), the
  * same documented divergence from batch as AsOfStream.
  *
  * Times are carried as epoch MICROSECOND longs (`us`) beside the
  * watermark column — q97 compares and subtracts µs-truncated time
  * (its DIV-1000 rule), and a Timestamp round-trip through `getTime`
  * would silently drop sub-ms — while `ts` (= `us` as a timestamp)
  * exists solely to drive the watermark.
  *
  * 100 TB posture: state is partitioned by user in the state store —
  * no driver-side anything. Per user it holds the k finalized stage
  * times plus only the in-horizon buffered events (bounded by the
  * watermark delay x per-user event rate); folded events are
  * discarded, and emitted users' state is removed.
  */
object FunnelStream {

  /** `us` = epoch microseconds; `ts` = the same instant as the
    * watermark column. `event_type` values outside the stage list are
    * ignored (q97 reads the same mixed event table).
    */
  final case class FEvent(user_id: Long, event_type: String,
      ts: Timestamp, us: Long)

  /** One per user on idle-timeout: `stage_us(k)` = first time stage k
    * was reached under the strictly-after rule, -1 if never.
    */
  final case class UserFunnel(user_id: Long, stage_us: Array[Long])

  /** stageTs(k) = finalized first-time for stage k (-1 unset); buf* =
    * parallel lists of not-yet-folded (us, stage) events; maxSeenMs =
    * latest event time observed, drives the idle timeout.
    */
  final case class FunnelState(stageTs: List[Long], bufUs: List[Long],
      bufStage: List[Int], maxSeenMs: Long)

  def funnelStream(events: Dataset[FEvent], stages: Seq[String],
      idleGapMs: Long = 60000L,
      delayThreshold: String = "1 hour"): Dataset[UserFunnel] = {
    val spark = events.sparkSession
    import spark.implicits._
    val k = stages.size
    require(k >= 1, "need at least one funnel stage")
    val stageIdx = stages.zipWithIndex.toMap

    // pre-filter to funnel stages map-side: non-stage events never
    // enter the shuffle or the state store
    val tagged = events
      .filter(col("event_type").isin(stages: _*))
      .withWatermark("ts", delayThreshold)

    // fold watermark-passed events in EVENT-TIME order: stage 0's
    // time is the first stage-0 event; stage k's is the first stage-k
    // event strictly after stageTs(k-1). Processing strictly in
    // event-time order makes "first eligible" exact: a stage time,
    // once set, can never be lowered by a later-processed event,
    // because the late-row filter guarantees nothing below the
    // watermark (= below every folded event) arrives again.
    def fold(stageTs: Array[Long], evs: Seq[(Long, Int)]): Unit =
      evs.sortBy(identity).foreach { case (us, s) =>
        if (stageTs(s) == -1L &&
            (s == 0 || (stageTs(s - 1) != -1L && us > stageTs(s - 1))))
          stageTs(s) = us
      }

    def fn(userId: Long, it: Iterator[FEvent],
        state: GroupState[FunnelState]): Iterator[UserFunnel] = {
      val prev = state.getOption
        .getOrElse(FunnelState(List.fill(k)(-1L), Nil, Nil, -1L))
      val stageTs = prev.stageTs.toArray
      if (state.hasTimedOut) {
        // idle: the watermark passed maxSeen + gap, so every buffered
        // event is below it — fold the remainder and finalize
        fold(stageTs, prev.bufUs.zip(prev.bufStage))
        state.remove()
        return Iterator.single(UserFunnel(userId, stageTs))
      }
      var buf = prev.bufUs.zip(prev.bufStage)
      var maxSeenMs = prev.maxSeenMs
      it.foreach { e =>
        buf ::= (e.us, stageIdx(e.event_type))
        maxSeenMs = math.max(maxSeenMs, e.us / 1000)
      }
      val wm = state.getCurrentWatermarkMs()
      // ripeness compares in MICROSECONDS: `us/1000 <= wm` would fold
      // events up to 999 µs past the watermark, and an admissible
      // earlier-microsecond event in that same millisecond (late rows
      // are dropped only below wm) could still arrive after a later
      // event in it was folded — breaking the event-time-order
      // invariant. `us <= wm*1000` folds only what nothing
      // still-admissible can precede (equality is safe: all stage
      // comparisons are strict, so same-instant order is immaterial).
      val (ripe, keep) = buf.partition(_._1 <= wm * 1000L)
      fold(stageTs, ripe)
      state.update(FunnelState(stageTs.toList, keep.map(_._1),
        keep.map(_._2), maxSeenMs))
      state.setTimeoutTimestamp(math.max(maxSeenMs + idleGapMs, wm + 1))
      Iterator.empty
    }

    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
