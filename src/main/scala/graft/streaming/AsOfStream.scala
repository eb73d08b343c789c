package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the continuous twin of
  * [[graft.operators.AsOfJoin.asofJoin]] (q53) and the streaming form
  * of the reference's "state as of this flight" lookup: every event
  * picks up the LATEST mark of its key at or before its event time.
  *
  * Why not enrich against "current state" as events arrive: event
  * time and arrival order disagree in a real stream — a mark can
  * arrive after an event it precedes in event time. Correct-by-
  * watermark instead: both sides are tag-unioned under ONE watermark
  * and buffered per key in `flatMapGroupsWithState`; an event is
  * emitted only once the watermark passes its event time — at that
  * point no in-watermark mark that could precede it can still arrive,
  * so the emission equals the batch as-of on the same data
  * (spec-asserted, out-of-order marks included).
  *
  * Semantics vs batch [[graft.operators.AsOfJoin.asofJoin]]:
  *   - a mark AT the event's exact time is visible (<=);
  *   - marks tied on (key, ts) resolve to the greatest mark_id (the
  *     batch greatest-payload rule on a single-column payload);
  *   - rows later than the watermark horizon are DROPPED by Spark's
  *     late-row filter: a too-late mark never rewrites an emitted
  *     event (append-mode semantics), a too-late event is never
  *     emitted — the one documented divergence from batch, which has
  *     no lateness bound.
  *
  * 100 TB posture: state is partitioned by key in the state store —
  * no driver-side anything. Per key it holds the in-flight events
  * (bounded by the watermark horizon x event rate) plus the mark
  * history PRUNED to one mark at-or-below the watermark (the only one
  * a future event can still need) and the in-horizon marks — NOT the
  * full mark history.
  */
object AsOfStream {

  final case class Event(event_id: Long, user_id: Long, ts: Timestamp)
  final case class Mark(mark_id: Long, user_id: Long, ts: Timestamp)
  final case class Enriched(event_id: Long, user_id: Long, ts: Timestamp,
      asof_mark_id: Option[Long], asof_ts: Option[Timestamp])

  /** Tag-union row: side 1 = event, side 0 = mark. (Package-visible,
    * not `private` — the deserializer's generated code must be able to
    * construct it.)
    */
  private[streaming] final case class Tagged(user_id: Long, ts: Timestamp,
      side: Int, event_id: Long, mark_id: Long)

  /** Per-key buffers as parallel lists (stable product encoder):
    * events pending flush, marks kept for future events.
    */
  final case class AsOfState(pendingTs: List[Long], pendingIds: List[Long],
      markTs: List[Long], markIds: List[Long])

  /** [[asofEnrichStream]] with a maximum lookback, the streaming twin
    * of [[graft.operators.AsOfJoin.asofJoinTolerance]]: a mark older
    * than `event.ts - toleranceMs` does not enrich (inclusive bound,
    * matching the batch form). Staleness is decided at EMISSION time
    * against the buffered match — the single-shuffle/state shape is
    * unchanged.
    */
  def asofEnrichStreamTolerance(events: Dataset[Event], marks: Dataset[Mark],
      toleranceMs: Long, delayThreshold: String = "1 hour"): Dataset[Enriched] =
    asofEnrichStream(events, marks, delayThreshold, Some(toleranceMs))

  def asofEnrichStream(events: Dataset[Event], marks: Dataset[Mark],
      delayThreshold: String = "1 hour",
      toleranceMs: Option[Long] = None): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    // one watermark over the tag-union (same trick as the batch
    // operator): a single event-time column drives late-row filtering
    // and timeouts for both sides
    val tagged = events.toDF()
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(-1L).as("mark_id"))
      .unionByName(marks.toDF()
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(-1L).as("event_id"), col("mark_id")))
      .withWatermark("ts", delayThreshold)
      .as[Tagged]

    def fn(userId: Long, it: Iterator[Tagged],
        state: GroupState[AsOfState]): Iterator[Enriched] = {
      val prev = state.getOption.getOrElse(AsOfState(Nil, Nil, Nil, Nil))
      var pending = prev.pendingTs.zip(prev.pendingIds)
      var mks = prev.markTs.zip(prev.markIds)
      it.foreach { r =>
        if (r.side == 1) pending ::= (r.ts.getTime, r.event_id)
        else mks ::= (r.ts.getTime, r.mark_id)
      }
      val wm = state.getCurrentWatermarkMs()
      val sortedMarks = mks.sortBy(identity)
      // flush events the watermark has passed: no in-watermark mark
      // that could precede them can still arrive
      val (flush, keep) = pending.partition(_._1 <= wm)
      val out = flush.sortBy(identity).map { case (ts, id) =>
        val m = sortedMarks.takeWhile(_._1 <= ts).lastOption
          // staleness bound applies to the LATEST match (same rule as
          // the batch tolerance form: an older candidate is strictly
          // more stale, so a stale latest means no candidate matches)
          .filter { case (mts, _) =>
            toleranceMs.forall(tol => mts >= ts - tol) }
        Enriched(id, userId, new Timestamp(ts),
          m.map(_._2), m.map(x => new Timestamp(x._1)))
      }
      // prune mark history: of the marks at or below the watermark,
      // only the LATEST can still be the as-of for a future event
      // (every future event's ts exceeds the watermark); marks above
      // it all stay
      val (below, above) = sortedMarks.partition(_._1 <= wm)
      // with a tolerance, a below-watermark mark older than wm - tol
      // can never enrich a future event (every future event's ts
      // exceeds wm, so the mark is stale for all of them) — drop it,
      // so dead keys' state is eventually removed entirely
      val keepBelow = below.lastOption
        .filter { case (mts, _) => toleranceMs.forall(tol => mts >= wm - tol) }
        .toList
      val kept = keepBelow ++ above
      if (keep.isEmpty && kept.isEmpty) state.remove()
      else {
        state.update(AsOfState(keep.map(_._1), keep.map(_._2),
          kept.map(_._1), kept.map(_._2)))
        // wake this key even if no further rows arrive for it:
        //  - pending events flush once the watermark passes the oldest;
        //  - mark-only state must ALSO re-wake or it is never re-pruned
        //    for keys whose event stream stops — at the smallest
        //    above-watermark mark (prunes to the single below-wm mark),
        //    else at the kept mark's tolerance expiry (removes the key).
        // Without a tolerance, a single compacted below-wm mark is
        // legitimately live forever (it IS the as-of value for any
        // future event) — no timeout to set, like a compacted KV entry.
        val wake: Option[Long] =
          if (keep.nonEmpty) Some(keep.map(_._1).min)
          else if (above.nonEmpty) Some(above.map(_._1).min)
          else keepBelow.headOption.flatMap { case (mts, _) =>
            toleranceMs.map(tol => math.max(mts + tol + 1, wm + 1)) }
        wake.foreach(state.setTimeoutTimestamp)
      }
      out.iterator
    }

    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
