package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.queries.TextQueries
import graft.sinks.Sinks
import graft.sources.Jsonl

/** The production drop-folder ingest, composed end-to-end from parts
  * that are each individually oracled: JSONL shards landing in a
  * directory ([[Jsonl.readJsonlStream]]) → the q61 curation decision
  * per micro-batch ([[TextQueries.curate]]) → idempotent keyed upsert
  * into the bucketed curated-documents table
  * ([[Sinks.mergeKeyedTable]]).
  *
  * Exactly-once table state from at-least-once execution: the file
  * source's checkpoint tracks which shards each micro-batch read, and
  * a crash AFTER the merge but BEFORE the checkpoint commit replays
  * the whole micro-batch — whose rows are then either dropped by the
  * cross-batch digest probe (merge committed: digests already in the
  * table) or re-admitted onto the same (doc_id, rev) keys (merge
  * rolled back by its recovery) — both converge (spec-proven with an
  * injected post-merge crash). A crash DURING the merge commit is
  * covered by the merge's own staged-write + parked-rename protocol.
  *
  * Cross-BATCH duplicate text under a different doc_id is handled
  * with the q80 delta-dedup shape: each admitted row carries its
  * text digest into the table, and a new batch's digests are probed
  * against the accumulated table before merging — the table side is
  * one column-pruned scan joined against a BROADCAST of the
  * micro-batch's digests, so the accumulated corpus never shuffles.
  *
  * 100 TB posture: curation's only wide work is the within-batch
  * exact-dedup digest shuffle (micro-batch-sized, not corpus-sized);
  * language/quality/split ride the scan; the cross-batch probe scans
  * one 32-char column of the table per batch (swap in a dedicated
  * digest side-table or Bloom filter — `bloom_build` — when the scan
  * dominates). Near-dup text across batches stays LSH territory
  * (q31/q33 over the accumulated table), deliberately not re-solved
  * per batch.
  */
object Ingest {

  /** Explicit ingest schema ([[Jsonl]]'s no-inference rule). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Start the composed ingest. `postMergeHook` is a test seam: it
    * runs after each micro-batch's merge is durable but before Spark
    * commits the batch to the checkpoint — throwing from it simulates
    * a crash in exactly the window that forces a replay of an
    * already-merged batch.
    */
  def curatedJsonlIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int = 16,
      postMergeHook: Long => Unit = _ => ()): StreamingQuery =
    Jsonl.readJsonlStream(spark, dropDir, docSchema)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val curated = TextQueries.curate(batch.toDF())
        val kept = curated.filter(col("keep"))
          .join(batch.toDF()
            .select(col("doc_id"), md5(col("text")).as("text_md5")),
            Seq("doc_id"))
          .withColumn("rev", lit(0L))
          .select(col("doc_id"), col("rev"), col("lang_pred"),
            col("quality_e4"), col("split"), col("text_md5"))
        // q80 delta-dedup shape: drop batch rows whose text digest is
        // already in the accumulated table (the table side is a
        // column-pruned scan against a broadcast of the batch digests
        // — the corpus never shuffles)
        val fs = new org.apache.hadoop.fs.Path(tablePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val admitted =
          if (!fs.exists(new org.apache.hadoop.fs.Path(tablePath))) kept
          else {
            val hits = spark.read.parquet(tablePath)
              .select(col("text_md5"))
              .join(broadcast(kept.select(col("text_md5")).distinct()),
                Seq("text_md5"), "left_semi")
              .distinct()
            kept.join(broadcast(hits), Seq("text_md5"), "left_anti")
          }
        Sinks.mergeKeyedTable(admitted, tablePath, "doc_id", "rev", buckets)
        postMergeHook(batchId)
      }
      .start()

  /** The ingested table, caller-keyed. */
  def readCurated(spark: SparkSession, tablePath: String): DataFrame =
    Sinks.readKeyedTable(spark, tablePath, "doc_id", "rev")
}
