package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar format next to parquet
  * (warehouses that standardized on Hive/Trino hand corpora over as
  * ORC, so an engine claiming "switch to this library" needs to read
  * them natively, not via a convert-first detour).
  *
  * Unlike the JSONL ingest boundary (see [[Jsonl]]), ORC is a REAL
  * analytical format: Spark's native vectorized reader gives batched
  * decode, column pruning, and predicate pushdown (min/max row-group
  * skipping), so the 100 TB posture is the parquet one — filters and
  * projections must reach the scan (`PushedFilters` in the plan,
  * pinned by OrcSpec), and a scan that decodes all five columns for a
  * two-column aggregate is a bug. Reads still take an EXPLICIT
  * schema: ORC files are self-describing, but pinning the schema at
  * the call site keeps a drifted upstream writer (int widened to
  * long, reordered fields) a loud failure instead of a silent
  * downstream type change.
  */
object Orc {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
