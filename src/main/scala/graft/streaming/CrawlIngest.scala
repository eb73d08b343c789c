package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.sources.Jsonl
import graft.text.Html

/** Streaming curation with the CRAWL front — q158's chain as the
  * drop-folder service (survey r16 candidate #1): shards carry RAW
  * pages `{doc_id, url, html}`, and each micro-batch runs
  * HTML extract (comments/CDATA/entities/quoted-attrs — the hardened
  * q142 pipeline) -> thin gate -> URL domain + broadcast blocklist ->
  * q61 curation -> crash-atomic keyed merge, through
  * [[Ingest.curateAndMerge]] — the SAME back half as the clean-text
  * ingest, so the exactly-once and cross-batch-dedup guarantees are
  * inherited, not re-argued.
  *
  * Deliberately NOT here: q158's cluster-aware leakage-safe split.
  * Near-dup CC is corpus-global by nature — a stream cannot know a
  * future member of a cluster — so the split stays a release-time
  * batch job over the accumulated table (q124/q158), and rows merge
  * with q61's per-doc split as the provisional label. Saying so
  * beats faking it.
  *
  * Gating transparency: blocked/thin docs are normal curation
  * outcomes, not malformed input — they are recorded (doc_id,
  * domain, reason) under `gatedDir/batch=<id>` (overwrite,
  * replay-idempotent) rather than quarantined, and never reach the
  * table. Malformed/null-key lines quarantine exactly as the JSONL
  * ingest's do.
  *
  * 100 TB posture: extraction + URL gate are batch-sized map work;
  * the blocklist is a broadcast dim (q143); everything wide is
  * curateAndMerge's documented machinery.
  */
object CrawlIngest {

  /** Explicit crawl-shard schema ([[Jsonl]]'s no-inference rule). */
  val crawlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("html", StringType)))

  private val Corrupt = "_corrupt_record"
  private val parseSchema = crawlSchema.add(Corrupt, StringType)

  def crawlHtmlIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String,
      blockedDomains: Seq[String], buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null,
      gatedDir: String = null): StreamingQuery = {
    import spark.implicits._
    val blocklist = blockedDomains.toDF("blocked_domain")
    Jsonl.readJsonlStreamRaw(spark, dropDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (lines: Dataset[Row], batchId: Long) =>
        val quarantine =
          Option(quarantineDir).getOrElse(Ingest.quarantinePath(tablePath))
        val parsed = lines
          .filter(col("value").rlike("\\S"))
          .select(col("value"),
            from_json(col("value"), parseSchema, Map(
              "mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> Corrupt)).as("j"))
          .persist()
        try {
          val bad = col("j").isNull || col(s"j.$Corrupt").isNotNull ||
            col("j.doc_id").isNull || col("j.url").isNull ||
            col("j.html").isNull
          val invalid = parsed.filter(bad)
            .select(col("value").as("raw"),
              when(col("j").isNull || col(s"j.$Corrupt").isNotNull,
                "malformed").otherwise("null_key").as("reason"))
          if (!invalid.isEmpty)
            invalid.write.mode(SaveMode.Overwrite)
              .json(s"$quarantine/batch=$batchId")
          val batch = parsed.filter(!bad).select(
            col("j.doc_id").as("doc_id"), col("j.url").as("url"),
            col("j.html").as("html"))
          // the q158 front: extract, registrable domain, gates
          val host = lower(regexp_extract(
            regexp_replace(col("url"), "#.*$", ""),
            "^[A-Za-z]+://([^/:?#]+)", 1))
          val domain = regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1)
          val staged = batch
            .select(col("doc_id"), domain.as("domain"),
              Html.extractMain(col("html")).getField("content").as("text"))
            .join(broadcast(blocklist),
              col("domain") === col("blocked_domain"), "left")
            .withColumn("blocked", col("blocked_domain").isNotNull)
            .drop("blocked_domain")
            .withColumn("thin", length(col("text")) === 0)
            .persist()
          try {
            if (gatedDir != null) {
              val gated = staged.filter(col("blocked") || col("thin"))
                .select(col("doc_id"), col("domain"),
                  when(col("blocked"), "blocked").otherwise("thin")
                    .as("reason"))
              if (!gated.isEmpty)
                gated.write.mode(SaveMode.Overwrite)
                  .json(s"$gatedDir/batch=$batchId")
            }
            val live = staged.filter(!col("blocked") && !col("thin"))
              .select(col("doc_id"), col("text"))
            // within-batch doc_id dedupe — the jsonl ingest's rule
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id")).orderBy(md5(col("text")))
            val deduped = live
              .withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
            Ingest.curateAndMerge(spark, deduped, tablePath, buckets,
              postMergeHook, batchId)
          } finally staged.unpersist()
        } finally parsed.unpersist()
      }
      .start()
  }

  /** The ingested table, caller-keyed. */
  def readCurated(spark: SparkSession, tablePath: String)
      : org.apache.spark.sql.DataFrame =
    Ingest.readCurated(spark, tablePath)
}
