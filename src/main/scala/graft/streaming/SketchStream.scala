package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** Streaming quantiles via the q89 HDR bucket histogram — the
  * streaming member of the sketch family (the batch twin is
  * `Relational.q89`; same log2-octave / 64-sub-bucket geometry, same
  * integer-only bucket arithmetic).
  *
  * Why this shape streams: the sketch state is (bucket -> count),
  * and counts ADD — the aggregation is associative, commutative, and
  * idempotent-under-replay in exactly the way Structured Streaming's
  * stateful agg needs, so per-window quantiles fall out of a plain
  * watermark + window groupBy with bounded state (<= ~64 buckets per
  * octave per window), no custom state machine. A percentile-exact
  * operator has no such decomposition — THE reason production
  * streaming quantiles are sketches.
  *
  * Scale posture: bucket assignment is map-only; each micro-batch
  * shuffles one (window, s, m, partial-count) row per occupied
  * bucket per task; state-store rows = occupied buckets per open
  * window. The finisher runs on the bucket table — thousands of
  * rows, not the stream.
  */
object SketchStream {

  /** Streaming per-window bucket histogram: tumbling `windowLen`
    * windows over `tsCol`, watermarked, counting occupied (s, m)
    * buckets of `valCol` (positive longs). The bucket key is
    * [[QuantileSketch.withBuckets]] — the SAME expressions the batch
    * twin aggregates, so stream and batch histograms are equal by
    * construction (SketchStreamSpec still proves it end-to-end).
    */
  def bucketCounts(values: DataFrame, tsCol: String, valCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours")
      : DataFrame =
    QuantileSketch.withBuckets(values.withWatermark(tsCol, watermark),
        col(valCol).cast("long"))
      .groupBy(window(col(tsCol), windowLen), col("s"), col("m"))
      .agg(count(lit(1)).as("c"))

  /** Batch finisher (foreachBatch / post-query): percentile estimates
    * from a bucket table — delegates to [[QuantileSketch.quantiles]];
    * `keys` are carried through (e.g. the window column).
    */
  def quantilesFromBuckets(buckets: DataFrame, keys: Seq[String],
      ps: Seq[Int]): DataFrame =
    QuantileSketch.quantiles(buckets, keys, ps)
}
