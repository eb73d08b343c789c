package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming join-key skew monitor — the streaming twin of the q106
  * batch audit (`Relational.q106`).
  *
  * Why this shape streams: the state is (window, key -> count), and
  * counts ADD — associative, commutative, replay-idempotent, so the
  * monitor is a plain watermarked window groupBy with state bounded
  * by |distinct keys| per open window (the same decomposition
  * argument as `SketchStream`; a top-N-exact operator has no such
  * decomposition, which is why the rank step belongs in the
  * finisher, not the stream).
  *
  * Production use: run [[skewFromCounts]] in `foreachBatch` over the
  * completed windows and alert when `skew_x1000` crosses the salting
  * threshold (DEPLOY.md's skew ladder) — the measure-before-salt
  * scout as a standing dashboard instead of a scheduled batch query,
  * catching a key turning hot WHILE it turns.
  */
object SkewStream {

  /** Streaming per-(window, key) counts: tumbling `windowLen` windows
    * over `tsCol`, watermarked. Bucket assignment is map-only; each
    * micro-batch shuffles one partial-count row per (window, key,
    * task); state rows = distinct keys per open window.
    */
  def keyCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours")
      : DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        col(keyCol).as("key_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Batch finisher: q106's long-format readout per window from a
    * (window, key_id, cnt) count table — top-N heavy keys plus
    * total/distinct/max and the divide-first integer skew ratio
    * `max * 1000 DIV (total DIV distinct)` (overflow-safe at any
    * realistic scale; see q106). Runs on key-cardinality-sized rows,
    * never the event stream.
    */
  def skewFromCounts(counts: DataFrame, topN: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("window"))
      .orderBy(col("cnt").desc, col("key_id"))
    val top = counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("window"), lit("top_key").as("metric"),
        col("key_id").cast("long").as("key_id"), col("cnt").as("n"))
    val summary = counts.groupBy(col("window"))
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("d"),
        max(col("cnt")).as("mx"))
      .selectExpr("window",
        """stack(4,
          |'total_rows', CAST(NULL AS BIGINT), total,
          |'distinct_keys', CAST(NULL AS BIGINT), d,
          |'max_cnt', CAST(NULL AS BIGINT), mx,
          |'skew_x1000', CAST(NULL AS BIGINT),
          |  mx * 1000L div (total div d)) AS (metric, key_id, n)
          |""".stripMargin)
    top.unionByName(summary)
      .orderBy(col("window"), col("metric"), col("key_id"))
  }
}
