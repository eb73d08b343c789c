package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.TextOps

/** Streaming incremental LINE dedup — q159's standing-service form
  * and the line-granularity member of the admission family
  * (NearDupStream: MinHash docs; PrefixDedupStream: exact-Jaccard
  * docs; MediaDedupStream: perceptual media; THIS: C4 lines): each
  * crawl micro-batch's lines admit against the release-time line
  * index ∪ the batch's own keep-first rule, and per-doc stats
  * (n_lines, n_kept, kept_sig — q150's row shape) land under
  * `outPath/batch=<id>`.
  *
  * Admit-and-grow (the continuous crawl's real policy, NearDupStream's
  * protocol verbatim): when `growIndexPath` is set, each batch (1)
  * reads the accumulated growth shards alongside the base index, and
  * (2) appends its own SURVIVING lines' digests under
  * `growIndexPath/batch=<id>` — so a line first seen in batch N is
  * boilerplate to batch N+1. Both writes are per-batch overwrites; a
  * crash-replayed batch excludes its own half-written growth shard
  * from its read (same-batch filter), re-derives identical stats, and
  * rewrites both dirs — convergent, spec-proven.
  *
  * 100 TB posture: the base index never shuffles (the
  * matchedBaseDigests probe inside [[TextOps.lineAdmitKept]]); growth
  * shards are surviving-line digests only — one 32-char column,
  * batch-sized each; everything else is batch-sized digest machinery.
  * Compaction of accrued `batch=` shards into the next release's
  * index is a plain parquet rewrite (distinct over one column).
  */
object LineDedupStream {

  /** The release-time index: distinct line digests of the corpus. */
  def buildIndex(docs: DataFrame): DataFrame =
    TextOps.buildLineIndex(docs)

  /** One batch's admission, exposed for batch callers and the spec. */
  def admitBatch(batch: DataFrame, index: DataFrame): DataFrame =
    TextOps.lineAdmitStats(batch, index)

  /** Start the admission stream over a streaming (doc_id, text)
    * frame.
    */
  def admissionStream(spark: SparkSession, docs: DataFrame,
      baseIndex: DataFrame, outPath: String, checkpointDir: String,
      growIndexPath: String = null,
      postBatchHook: Long => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // persisted: the keeper aggregate, the base probe, the stats
        // join, and the growth write would each re-read the batch's
        // source otherwise (the Ingest precedent)
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val index =
              if (growIndexPath == null) baseIndex
              else {
                val p = new org.apache.hadoop.fs.Path(growIndexPath)
                val fs = p.getFileSystem(
                  spark.sparkContext.hadoopConfiguration)
                val all =
                  if (!fs.exists(p)) Nil
                  else fs.listStatus(p).toSeq.map(_.getPath)
                    .filter(_.getName.startsWith("batch="))
                Shards.requireNoLaterShards(all, batchId, growIndexPath)
                val shards = all
                  // a replayed batch must not read its own (possibly
                  // half-written) growth shard from the crashed run
                  .filterNot(_.getName == s"batch=$batchId")
                  .map(_.toString)
                if (shards.isEmpty) baseIndex
                else baseIndex.unionByName(spark.read.parquet(shards: _*))
              }
            // kept evaluates twice (stats write + growth write);
            // persisted so the base probe runs once per batch
            val kept = TextOps.lineAdmitKept(b, index).persist()
            try {
              TextOps.lineStatsFrom(kept, b)
                .write.mode(SaveMode.Overwrite)
                .parquet(s"$outPath/batch=$batchId")
              if (growIndexPath != null)
                kept.select(col("lh")).distinct()
                  .write.mode(SaveMode.Overwrite)
                  .parquet(s"$growIndexPath/batch=$batchId")
              postBatchHook(batchId)
            } finally kept.unpersist()
          }
        } finally b.unpersist()
      }
      .start()
}
