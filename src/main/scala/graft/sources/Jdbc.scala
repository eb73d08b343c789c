package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (SURVEY.md §2.1 S1/S2/S3): the reference's actual input
  * boundary is a MySQL connection — the pending-flights work list
  * (`main.py:27,128-131`), the aircraft-type point lookup
  * (`main.py:28,83-84`) and the per-flight time-series scan
  * (`main.py:29-37`) are all `SELECT`s over it. The engine's
  * driver-contract queries read parquet instead, but the JDBC path is
  * a first-class source here, not a footnote: [[read]] for dimension
  * tables, [[readPartitioned]] for facts.
  *
  * Spark's JDBC relation pushes filters and projections into the
  * remote database (`PushedFilters`/`PushedPredicates` in the scan
  * node — JdbcSpec pins it), so the reference's `WHERE
  * approach_analysis = 0` work-list predicate executes remotely
  * exactly as it did in `main.py:27`, never as a full-table pull.
  *
  * 100 TB posture: a single-connection JDBC read is one task — a
  * driver-shaped bottleneck. [[readPartitioned]] slices the table
  * into `numPartitions` stride predicates on a numeric column
  * (`WHERE col >= lo AND col < hi` per task), so 1000 executors each
  * hold one slice-sized connection. Partition count is the caller's
  * dial: it is bounded by what the DATABASE tolerates as concurrent
  * connections, not by Spark — a thousand-way scan of one MySQL
  * primary is a self-inflicted outage; scale the fan-out to the
  * replica pool (the usual production shape is tens, with the bulk
  * copy landing in parquet once and every later read hitting that).
  */
object Jdbc {

  /** Whole-table (or dimension) read over one connection. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel read: `numPartitions` non-overlapping
    * stride predicates on `partitionCol` (numeric, indexed in the
    * source DB or each slice is a table scan there). Rows with a NULL
    * partition column land in the first slice (Spark's convention).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props)
}
