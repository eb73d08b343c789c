package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, LongType, StringType,
  StructField, StructType, TimestampType}

import graft.sinks.Sinks

/** Streaming WARC/TFRecord drop-folder ingest — `Ingest`'s
  * exactly-once protocol composed with the q153/q154 container walks
  * (the r14 verdict's item #3): crawl/training shards land as FILES
  * in a directory, each micro-batch walks the new shards' bytes on
  * the executors, and the decoded records upsert into a bucketed
  * keyed table through the same crash-atomic merge the JSONL ingest
  * uses. This is the standing-service form of a crawl pipeline's
  * archive boundary: q153/q154 prove the walks against the DuckDB
  * oracle in batch; this wires them to arrival.
  *
  * Quarantine-WHOLE (the shared q153/q154 rule): a shard failing ANY
  * checksum — member CRC32/ISIZE, record masked-CRC32C, header CRC16,
  * malformed framing — contributes ZERO rows and is named in
  * `quarantineDir/batch=<id>` as `{raw, reason}` JSONL (raw = the
  * shard file name), overwritten per batch id so a crash-replayed
  * batch rewrites rather than duplicates its quarantine entries. A
  * checksum failure anywhere in a shard means the producer or the
  * transport is broken and every other byte in that shard is suspect.
  * The decompression-bomb cap quarantines under its OWN reason
  * ("too_large", gzip/zip walks): an oversized-but-valid shard is the
  * operator's to re-ingest with a raised `maxBytes`, not a corrupt one.
  *
  * Exactly-once table state from at-least-once execution, exactly
  * `Ingest`'s argument: the binary file source's checkpoint tracks
  * which shard files each micro-batch read; a crash AFTER the merge
  * but BEFORE the checkpoint commit replays the batch, whose rows
  * re-derive the SAME (rec_key, rev) keys — the keyed upsert
  * converges instead of duplicating (spec-proven with the injected
  * post-merge crash). `rec_key` is the salted 60-bit digest of
  * `shard#ordinal`, deterministic across replays and engines;
  * 60 bits of keyspace make a collision across even a trillion
  * records a ~1e-7 event, and the merge key carries the (shard,
  * ordinal) columns beside it so a collision is detectable, not
  * silent.
  *
  * 100 TB posture: the walk is map-only over each shard's bytes (one
  * executor-side pass, payloads never shuffle — the q136/q153 rule);
  * the only wide work is the merge's bucket repartition of the
  * DECODED record rows (narrow: ordinals, digests, lengths). Shards
  * parallelize across executors via the file source's own listing;
  * `maxFilesPerTrigger` bounds a backlog burst.
  */
object ShardIngest {

  /** The binary file source's fixed schema (streaming reads require
    * it stated explicitly; inference is refused by the source).
    */
  val shardSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Tail a drop folder of binary shards. */
  def readShardStream(spark: SparkSession, dropDir: String): DataFrame =
    spark.readStream.format("binaryFile").schema(shardSchema)
      .load(dropDir)

  /** One decoded gzip member (shard-relative; the table row). */
  final case class GzipShardRec(member: Long, name: String,
      n_bytes: Long, body_md5: String, n_members: Long)

  /** One decoded TFRecord (shard-relative; the table row). */
  final case class TfShardRec(rec: Long, n_bytes: Long, f1: Long,
      f2_md5: String, n_records: Long)

  /** WARC-style multi-member gzip ingest (q153's walk). Table rows:
    * (rec_key, rev, shard, member, name, n_bytes, body_md5,
    * n_members).
    */
  def gzipShardIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null,
      maxBytes: Long = 1L << 26): StreamingQuery = {
    import spark.implicits._
    runShardIngest(spark, dropDir, tablePath, checkpointDir, buckets,
      postMergeHook, quarantineDir, ordinalCol = "member") { files =>
      files.select(fileName(col("path")).as("shard"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (shard, bytes) =>
          graft.multimodal.GzipMembers.walkDetail(0L, bytes, maxBytes)
            .map(_.map(m => GzipShardRec(
              m.member, m.name, m.n_bytes, m.body_md5, m.n_members)))
            match {
              case Right(rows) => (shard, null: String, rows)
              case Left(reason) =>
                (shard, reason, Vector.empty[GzipShardRec])
            }
        }
        .toDF("shard", "reason", "rows")
    }
  }

  /** TFRecord shard ingest (q154's walk). Table rows: (rec_key, rev,
    * shard, rec, n_bytes, f1, f2_md5, n_records).
    */
  def tfrecordShardIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null): StreamingQuery = {
    import spark.implicits._
    runShardIngest(spark, dropDir, tablePath, checkpointDir, buckets,
      postMergeHook, quarantineDir, ordinalCol = "rec") { files =>
      files.select(fileName(col("path")).as("shard"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (shard, bytes) =>
          val rows = graft.multimodal.Tfrecord.walk(0L, bytes)
            .map(_.map(r => TfShardRec(
              r.rec, r.n_bytes, r.f1, r.f2_md5, r.n_records)))
          (shard,
            if (rows.isDefined) null: String else "checksum_or_framing",
            rows.getOrElse(Vector.empty))
        }
        .toDF("shard", "reason", "rows")
    }
  }

  /** One decoded ZIP entry (shard-relative; the table row). */
  final case class ZipShardRec(idx: Long, entry: String, n_bytes: Long,
      method: String, body_md5: String, n_entries: Long)

  /** One decoded WebDataset tar member: `stem` is the training-sample
    * key (name up to the first '.'), `n_in_sample` its member count —
    * the q137 columns, so incomplete samples reject without re-reading
    * the shard.
    */
  final case class TarShardRec(idx: Long, stem: String, entry: String,
      n_bytes: Long, body_md5: String, n_in_sample: Long)

  /** ZIP shard ingest (strict whole-archive walk; q136's family).
    * Table rows: (rec_key, rev, shard, idx, entry, n_bytes, method,
    * body_md5, n_entries).
    */
  def zipShardIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null,
      maxBytes: Long = 1L << 26): StreamingQuery = {
    import spark.implicits._
    runShardIngest(spark, dropDir, tablePath, checkpointDir, buckets,
      postMergeHook, quarantineDir, ordinalCol = "idx") { files =>
      files.select(fileName(col("path")).as("shard"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (shard, bytes) =>
          graft.multimodal.Archives.zipEntriesDetail(bytes, maxBytes)
            .map { es =>
              es.zipWithIndex.map { case ((name, n, method, md5), i) =>
                ZipShardRec(i.toLong, name, n, method, md5,
                  es.size.toLong)
              }
            }
            match {
              case Right(rows) => (shard, null: String, rows)
              case Left(reason) =>
                (shard, reason, Vector.empty[ZipShardRec])
            }
        }
        .toDF("shard", "reason", "rows")
    }
  }

  /** WebDataset tar shard ingest (q137's walk: checksum-verified
    * ustar headers, stems + per-stem member counts computed in the
    * walk). Table rows: (rec_key, rev, shard, idx, stem, entry,
    * n_bytes, body_md5, n_in_sample).
    */
  def tarShardIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null): StreamingQuery = {
    import spark.implicits._
    runShardIngest(spark, dropDir, tablePath, checkpointDir, buckets,
      postMergeHook, quarantineDir, ordinalCol = "idx") { files =>
      files.select(fileName(col("path")).as("shard"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (shard, bytes) =>
          val decoded = graft.multimodal.Archives.tarMembers(bytes)
            .map { members =>
              val md = java.security.MessageDigest.getInstance("MD5")
              val stems = members
                .groupBy { case (name, _, _) => name.takeWhile(_ != '.') }
                .map { case (k, v) => k -> v.size.toLong }
              members.toVector.zipWithIndex.map {
                case ((name, off, len), i) =>
                  md.reset()
                  md.update(bytes, off, len)
                  TarShardRec(i.toLong, name.takeWhile(_ != '.'), name,
                    len.toLong,
                    md.digest().map(b => f"$b%02x").mkString,
                    stems(name.takeWhile(_ != '.')))
              }
            }
          (shard,
            if (decoded.isDefined) null: String else "checksum_or_framing",
            decoded.getOrElse(Vector.empty))
        }
        .toDF("shard", "reason", "rows")
    }
  }

  /** One walked WARC page (or a quarantine row: reason non-null,
    * member -1 for whole-shard failures).
    */
  final case class WarcPage(shard: String, member: Long,
      reason: String, doc_id: Long, url: String, html: String)

  /** WARC-shard CURATION ingest (r17) — the container boundary driven
    * INTO the curation chain, closing the gap between "the walk is
    * proven" (q153/q163 batch oracles; gzipShardIngest lands digests)
    * and "a pipeline can actually run from shards": crawl archives
    * drop as multi-member gzip files, each micro-batch walks them
    * executor-side with the bodies-carrying strict walk
    * ([[graft.multimodal.GzipMembers.membersFull]]), parses each
    * record with the SHARED codec ([[graft.multimodal.Warc]] — the
    * same parse q163 oracles, so service and query cannot drift),
    * and the decoded pages run [[CrawlIngest.curatePages]] — the
    * exact front+merge the JSONL crawl ingest uses, so the
    * composition law (streamed curation == batch curation of the
    * clean text) and the exactly-once replay argument are inherited,
    * not re-argued.
    *
    * Quarantine granularity, two-level by design: byte corruption
    * (CRC/framing/bomb-cap) quarantines the shard WHOLE under the
    * walk's named reason — every byte is suspect (the q153 rule;
    * the reason is re-derived by the digest walk only for failed
    * shards); a VALID shard carrying a foreign/unparsable record
    * quarantines that RECORD alone ("unparsable_record", raw =
    * "shard#member") and the rest of the shard proceeds.
    *
    * 100 TB posture: walk + parse are map-only per shard (payloads
    * never shuffle); everything after is curatePages' documented
    * machinery.
    */
  def warcCurationIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String,
      blockedDomains: Seq[String], buckets: Int = 16,
      postMergeHook: Long => Unit = _ => (),
      quarantineDir: String = null, gatedDir: String = null,
      blocklistTable: DataFrame = null,
      blocklistEntryCol: String = "entry",
      maxBytes: Long = 1L << 26): StreamingQuery = {
    import spark.implicits._
    readShardStream(spark, dropDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (files: Dataset[Row], batchId: Long) =>
        val quarantine =
          Option(quarantineDir).getOrElse(Ingest.quarantinePath(tablePath))
        // persisted: the quarantine probe and curatePages' stages
        // would each re-read and re-walk the shard bytes otherwise
        val walked = files
          .select(fileName(col("path")).as("shard"), col("content"))
          .as[(String, Array[Byte])]
          .flatMap { case (shard, bytes) =>
            graft.multimodal.GzipMembers.membersFull(bytes, maxBytes)
              match {
                case Some(ms) =>
                  ms.iterator.zipWithIndex.map { case ((_, body), i) =>
                    graft.multimodal.Warc.parse(body) match {
                      case Some((id, url, html)) =>
                        WarcPage(shard, i.toLong, null, id, url, html)
                      case None =>
                        WarcPage(shard, i.toLong, "unparsable_record",
                          -1L, null, null)
                    }
                  }
                case None =>
                  val reason = graft.multimodal.GzipMembers
                    .walkDetail(0L, bytes, maxBytes)
                    .left.toOption.getOrElse("checksum_or_framing")
                  Iterator.single(
                    WarcPage(shard, -1L, reason, -1L, null, null))
              }
          }.toDF().persist()
        try {
          val bad = walked.filter(col("reason").isNotNull)
            .select(concat_ws("#", col("shard"),
                when(col("member") >= 0, col("member").cast("string")))
              .as("raw"), col("reason"))
          if (!bad.isEmpty)
            bad.write.mode(SaveMode.Overwrite)
              .json(s"$quarantine/batch=$batchId")
          CrawlIngest.curatePages(spark,
            walked.filter(col("reason").isNull)
              .select(col("doc_id"), col("url"), col("html")),
            tablePath, buckets, postMergeHook, batchId, blockedDomains,
            blocklistTable, blocklistEntryCol, gatedDir)
        } finally walked.unpersist()
      }
      .start()
  }

  /** The ingested table, caller-keyed. */
  def readShardTable(spark: SparkSession, tablePath: String): DataFrame =
    Sinks.readKeyedTable(spark, tablePath, "rec_key", "rev")

  private def fileName(path: org.apache.spark.sql.Column) =
    element_at(split(path, "/"), -1)

  /** Shared harness: per micro-batch, `decode` turns the batch's
    * shard files into (shard, reason, rows:array<struct>) — a
    * non-null reason means the WHOLE shard quarantines under that
    * reason ("too_large" for an over-cap valid shard, "checksum_or_
    * framing" for corruption); good rows explode via `inline` (struct
    * field names become table columns), key on the salted digest of
    * shard#ordinal, and upsert.
    */
  private def runShardIngest(spark: SparkSession, dropDir: String,
      tablePath: String, checkpointDir: String, buckets: Int,
      postMergeHook: Long => Unit, quarantineDir: String,
      ordinalCol: String)(decode: Dataset[Row] => DataFrame)
      : StreamingQuery =
    readShardStream(spark, dropDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (files: Dataset[Row], batchId: Long) =>
        val quarantine =
          Option(quarantineDir).getOrElse(Ingest.quarantinePath(tablePath))
        // persisted: the quarantine probe, the emptiness probe, and
        // the merge's staged write would each re-run the walk (and
        // re-read the shard bytes) otherwise
        val walked = decode(files).persist()
        try {
          val bad = walked.filter(col("reason").isNotNull)
            .select(col("shard").as("raw"), col("reason"))
          if (!bad.isEmpty)
            bad.write.mode(SaveMode.Overwrite)
              .json(s"$quarantine/batch=$batchId")
          // register on the MICRO-BATCH's session: foreachBatch hands
          // an isolated session CLONE whose function registry was
          // snapshotted at stream start — registering on the outer
          // session resolves nothing here (surfaced by the
          // local-cluster gate, where no earlier code had registered)
          graft.functions.GraftFunctions.register(walked.sparkSession)
          val keyed = walked.filter(col("reason").isNull)
            .select(col("shard"), inline(col("rows")))
            .withColumn("rec_key", call_function("md5_long60",
              concat(col("shard"), lit("#"),
                col(ordinalCol).cast("string"))))
            .withColumn("rev", lit(0L))
          Sinks.recoverTable(spark, tablePath)
          Sinks.mergeKeyedTable(keyed, tablePath, "rec_key", "rev",
            buckets)
          postMergeHook(batchId)
        } finally walked.unpersist()
      }
      .start()
}
