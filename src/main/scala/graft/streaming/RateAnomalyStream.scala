package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Relational

/** Streaming event-rate anomaly monitor — the streaming twin of the
  * q119 batch audit, and the fourth member of the standing-monitor
  * family (text drift q111, key skew q106, embedding drift q114's
  * geometry, this: rate anomalies).
  *
  * Why this shape streams: the state is ((event_type, hour) -> count)
  * and counts ADD — associative, commutative, replay-idempotent (the
  * DriftStream decomposition) — so each micro-batch appends its own
  * hourly rollup partial and the accumulated table re-aggregates to
  * EXACTLY the all-data rollup. The trailing-window 2-sigma test has
  * no such decomposition (a window frame over ordered hours), so it
  * lives in the finisher, run on rollup-sized rows — never the event
  * stream.
  *
  * Exactly-once: a crash-replayed micro-batch OVERWRITES its own
  * `batch=<id>` dir (the Ingest-quarantine protocol shared by every
  * foreachBatch sink in this package).
  *
  * 100 TB posture: the per-batch exchange is the map-side-combined
  * (type, hour, n) aggregate — catalog x time sized; the finisher
  * reads only the accrued partial shards and its frame is 6 rows
  * deep per type. Compact shards on the quarantine cadence.
  */
object RateAnomalyStream {

  /** Start the standing rollup stream: per micro-batch of events
    * with a `ts` timestamp and `event_type`, one map-side-combined
    * (event_type, hour, n) aggregate appended under
    * `partialsPath/batch=<id>`.
    */
  def rollupPartials(spark: SparkSession, events: DataFrame,
      partialsPath: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        rollupBatch(batch, partialsPath, batchId)
      }
      .start()

  /** The per-micro-batch body — exposed so the replay spec exercises
    * THE sink the stream runs (the DeconStream.screenBatch precedent).
    */
  def rollupBatch(batch: Dataset[Row], partialsPath: String,
      batchId: Long): Unit = {
    // no session-conf toggling here: hourBucket is timezone-
    // INDEPENDENT (pure UTC epoch arithmetic), so this body cannot
    // shift buckets under a non-UTC streaming driver and cannot race
    // other queries co-running in the shared session (the earlier
    // save/restore of spark.sql.session.timeZone did both).
    val b = batch.persist()
    try {
      if (!b.isEmpty)
        b.groupBy(Relational.hourBucket(col("ts")).as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$partialsPath/batch=$batchId")
    } finally b.unpersist()
  }

  /** Finisher: accumulated rollup partials → q119's anomaly flags.
    * Counts ADD, so the re-aggregate recovers the exact all-data
    * rollup regardless of batching. Before the first non-empty batch
    * lands there is no parquet to infer a schema from — return the
    * empty flag set instead of throwing.
    */
  def anomalies(spark: SparkSession, partialsPath: String): DataFrame =
    Relational.anomalyFlags(accumulatedRollup(spark, partialsPath))

  /** Second finisher over the SAME partials: q120's per-type
    * least-squares trend — one partials stream feeds both standing
    * readouts, which is the point of the counts-ADD decomposition.
    */
  def trends(spark: SparkSession, partialsPath: String): DataFrame =
    Relational.trendFit(accumulatedRollup(spark, partialsPath))

  /** The exact all-data (hour, event_type, n) rollup from the
    * accrued per-batch partials (counts ADD; empty pre-first-batch
    * window reads as an empty rollup).
    */
  private def accumulatedRollup(spark: SparkSession,
      partialsPath: String): DataFrame = {
    import org.apache.spark.sql.types._
    Shards.readOrEmpty(spark, partialsPath, StructType(Seq(
        StructField("hour", StringType),
        StructField("event_type", StringType),
        StructField("n", LongType))))
      .groupBy(col("hour"), col("event_type"))
      .agg(sum(col("n")).as("n"))
  }
}
