package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextQueries
import graft.text.TextOps

/** Streaming corpus drift monitor — the streaming twin of the q111
  * batch audit.
  *
  * Why this shape streams: the state is (term -> count) and counts
  * ADD — associative, commutative, replay-idempotent (the SkewStream/
  * SketchStream decomposition argument) — so each micro-batch appends
  * its own (term, n) partial-count table and the accumulated table
  * re-aggregates to EXACTLY the all-data counts. The rank/readout
  * (cross-multiplied rate diffs, top-20) has no such decomposition,
  * so it lives in the finisher, run on vocab-sized count rows — never
  * the token stream.
  *
  * Production use: the delta-counts stream runs standing over the
  * crawl drop folder; [[drift]] runs on whatever cadence the data
  * dashboard refreshes, against a base count table built once per
  * corpus release ([[TextQueries.termCounts]], persisted). Alert when
  * a term's rate shift crosses a threshold — vocabulary drift caught
  * WHILE the crawl lands, not at the next training run.
  *
  * Exactly-once: a crash-replayed micro-batch OVERWRITES its own
  * `batch=<id>` dir (the Ingest-quarantine protocol), so replays
  * cannot double-count.
  */
object DriftStream {

  /** Start the standing delta-counts stream: per micro-batch, one
    * map-side-combined (term, n) aggregate appended under
    * `countsPath/batch=<id>`.
    */
  def deltaCounts(spark: SparkSession, docs: DataFrame,
      countsPath: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          batch.select(explode(TextOps.tokens(col("text"))).as("term"))
            .groupBy(col("term")).agg(count(lit(1)).as("n"))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$countsPath/batch=$batchId")
      }
      .start()

  /** Finisher: accumulated per-batch delta counts vs a base count
    * table → the q111 readout. The tagged union keeps the collapse a
    * single aggregate (no vocab-sized join), matching the batch plan.
    */
  def drift(spark: SparkSession, countsPath: String,
      baseCounts: DataFrame): DataFrame = {
    // pre-first-batch poll: an empty delta-count table instead of a
    // schema-inference throw; the readout then degenerates
    // gracefully (all diffs zero, delta rates NULL via 0 DIV 0)
    val deltaCounts = Shards.readOrEmpty(spark, countsPath,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    val tagged = deltaCounts
      .select(col("term"), col("n"), lit(1L).as("side"))
      .union(baseCounts.select(col("term"), col("cb").as("n"),
        lit(0L).as("side")))
    TextQueries.driftReadout(tagged.groupBy(col("term")).agg(
      sum(when(col("side") === 1, col("n")).otherwise(0L)).as("cd"),
      sum(when(col("side") === 0, col("n")).otherwise(0L)).as("cb")))
  }
}
