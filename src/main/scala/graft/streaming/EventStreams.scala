package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value) — SURVEY.md §2.9.
  *
  * The reference is strictly batch; these are the streaming twins of
  * the batch queries (q15 hourly windows, q11 sessionization) built
  * the idiomatic way: event-time watermarks + windowed aggregation,
  * and `flatMapGroupsWithState` with an event-time timeout for
  * session state. Both scale by key partitioning: state lives in the
  * state store, partitioned by user, no driver-side anything.
  */
object EventStreams {

  /** Tumbling 1-hour event-time aggregation with a 2-hour watermark
    * (streaming twin of Relational.q15).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Streaming exact dedup over a document stream — the streamed twin
    * of the batch hash-groupBy dedup (TextQueries.q30) for a
    * training-data ingest pipeline: keep the first document per
    * content digest, drop re-ingested duplicates arriving within the
    * watermark horizon. Scale posture matches the batch operator:
    * state and shuffle key are the 16-byte md5 digest, raw text never
    * shuffles; state size = unique digests inside the horizon, evicted
    * by watermark.
    */
  def dedupDocuments(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("h")

  /** Stream-stream interval join — the streaming twin of the batch
    * range join (Relational.q54): every left event pairs with the
    * right-stream rows of the same user whose event time falls in
    * [l.ts - lookbackSeconds, l.ts]. Both sides carry watermarks and
    * the join condition bounds event time in BOTH directions, which
    * is exactly what Structured Streaming needs to evict join state:
    * a buffered right row is dropped once the left watermark passes
    * r.ts + lookback, so state is bounded by rate x lookback per
    * key, never unbounded. Inputs must expose (user_id, ts) plus
    * disjoint payload columns; `delayThreshold` is each side's
    * allowed lateness.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lookbackSeconds: Long, delayThreshold: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", delayThreshold).alias("l")
    val r = right.withWatermark("ts", delayThreshold).alias("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
              |r.ts >= l.ts - INTERVAL $lookbackSeconds SECONDS AND
              |r.ts <= l.ts""".stripMargin))
  }

  /** Stream-static enrichment join: a streaming fact against a batch
    * dimension — the streaming twin of the batch broadcast dim join
    * (Relational.q04/q18; the reference's per-flight aircraft-type
    * lookup, main.py:28,83-84, is exactly this shape run
    * continuously). No watermark is needed: Spark re-plans the static
    * side per micro-batch and keeps NO join state (the stream side
    * never buffers), so this is stateless and scales like the batch
    * broadcast join — the dimension broadcasts when small, and a
    * changed dimension table is picked up on the next micro-batch.
    * `how` = "inner" or "left_outer" (left = keep facts with no dim
    * row, the reference's behavior for unknown aircraft).
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: Seq[String],
      how: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), key, how)

  /** One user session: closed after `gapSeconds` of event-time
    * silence (twin of the batch gaps-and-islands in Relational.q11).
    */
  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Event-time sessionization via flatMapGroupsWithState: state per
    * user holds the open session; events extend it when within the
    * gap, close-and-emit when beyond it; the event-time timeout emits
    * the final session once the watermark passes.
    */
  def sessionize(events: Dataset[SessionEvent],
      gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000

    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, new Timestamp(s.start),
          new Timestamp(s.end), s.n, s.sum))
      }
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // An event merges only if it lands within the gap of the
          // session's span on EITHER side: `t - s.end` is negative for
          // any out-of-order event (vacuously within gap), so a late
          // event must also be within gap of the session start or it
          // belongs to an earlier session (matches the batch q11 twin,
          // which would emit separate islands).
          case Some(s) if t - s.end <= gapMs && s.start - t <= gapMs =>
            // min() on start: a late-but-in-watermark event from a
            // previous batch may precede the stored session start
            cur = Some(SessionState(math.min(s.start, t),
              math.max(s.end, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            out ::= Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
