package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.approach.{AirportIndex, ApproachDetector}
import graft.model.{Airport, Approach, FlightSample, Thresholds}

/** Streaming twin of the flagship approach pipeline (SURVEY.md §2.9):
  * per-flight sensor samples arrive as an event-time stream; each
  * flight's samples accumulate in keyed state; once the watermark
  * passes the flight's last sample + `gapSeconds` (the flight stopped
  * transmitting), the full trace runs through the same
  * [[ApproachDetector]] as the batch path and the approaches are
  * emitted exactly once.
  *
  * Scale posture: state is per-flight (bounded: hours of 1 Hz samples
  * < ~100k rows), partitioned by flight across executors in the state
  * store; airports are broadcast; no driver-side state. The detector
  * itself is reused verbatim — batch/stream parity by construction.
  *
  * Caveat (inherent to gap-based completion): a mid-flight
  * transmission dropout longer than `gapSeconds` closes the flight
  * early — the detector runs on the partial trace, and a later
  * resumption starts a fresh buffer whose approaches restart at
  * approach_id 1. Size `gapSeconds` above the worst expected sensor
  * dropout (it bounds result latency, not correctness, for gap-free
  * feeds); a downstream sink keyed on (flight_id, approach_id) must
  * treat re-emission for the same flight as a split-trace signal.
  */
object ApproachStream {

  /** A sensor sample with the event-time column the watermark uses. */
  final case class TimedSample(ts: Timestamp, sample: FlightSample)

  final case class FlightBuffer(samples: Seq[FlightSample], lastMs: Long)

  def detectApproaches(
      stream: Dataset[TimedSample],
      airports: Array[Airport],
      th: Thresholds = Thresholds(),
      gapSeconds: Long = 300,
      watermark: String = "10 minutes"): Dataset[Approach] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // broadcast the PREBUILT index: constructing it per timed-out
    // flight would redo the O(airports) grid build millions of times
    val bIndex = spark.sparkContext.broadcast(new AirportIndex(airports))
    val gapMs = gapSeconds * 1000

    def fn(flightId: Long, it: Iterator[TimedSample],
        state: GroupState[FlightBuffer]): Iterator[Approach] = {
      if (state.hasTimedOut) {
        val buf = state.get
        state.remove()
        val detector = new ApproachDetector(bIndex.value, th)
        return detector
          .detect(flightId, buf.samples.sortBy(_.time).toIndexedSeq)
          .iterator
      }
      val incoming = it.toSeq
      val prev = state.getOption.getOrElse(FlightBuffer(Nil, 0L))
      val merged = FlightBuffer(
        prev.samples ++ incoming.map(_.sample),
        math.max(prev.lastMs, incoming.map(_.ts.getTime).max))
      state.update(merged)
      state.setTimeoutTimestamp(merged.lastMs + gapMs)
      Iterator.empty
    }

    stream
      .withWatermark("ts", watermark)
      .groupByKey(_.sample.flight)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
