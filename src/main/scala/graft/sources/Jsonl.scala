package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the de-facto interchange format of
  * training-data pipelines (one JSON object per line; newlines and
  * unicode travel escaped, so arbitrary document text round-trips
  * losslessly).
  *
  * 100 TB posture: reads take an EXPLICIT schema — schema inference
  * is a full extra pass over the corpus spent learning five field
  * names, and a drifting inferred type (a field that happens to look
  * numeric in one day's shard) silently changes downstream semantics.
  * Writes shard one file per partition like every other sink; JSONL
  * has no column pruning or predicate pushdown, so it is the INGEST
  * boundary format — convert to parquet (and Z-order, if queried
  * multi-dimensionally) before analytical work.
  */
object Jsonl {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Continuous ingest twin: tail a directory of JSONL shards as a
    * stream (each newly landed file becomes a micro-batch — the
    * standard drop-folder ingest). Same explicit-schema rule; the
    * file-source checkpoint tracks processed files, so a restarted
    * query resumes without re-ingesting. `maxFilesPerTrigger` bounds
    * micro-batch size when a backlog lands at once.
    */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Raw-line ingest twin: the same drop-folder tailing, but each
    * shard line arrives VERBATIM as `value` (text source) for the
    * caller to parse with `from_json`. This is the quarantine-capable
    * shape: the JSON source surrenders the raw line only for
    * unparseable records (`_corrupt_record`) — a line that parses but
    * fails validation (null key) is no longer recoverable byte-exact.
    * Reading text and parsing as a column keeps the original line
    * alongside the parse result for every outcome.
    */
  def readJsonlStreamRaw(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path)
}
