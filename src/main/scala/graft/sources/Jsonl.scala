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
}
