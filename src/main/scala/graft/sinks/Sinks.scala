package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

import graft.model.Approach

/** Output sinks (SURVEY.md §2.1 S6/S7). The reference upserts into
  * MySQL (`INSERT .. ON DUPLICATE KEY UPDATE`, FlightAnalysis.py:
  * 400-431) and flips a per-flight done flag (py:432-437). Spark has
  * no multi-table transaction; [[writeApproaches]] is the snapshot
  * form (whole-table replace) and [[mergeApproaches]] is the
  * incremental per-key upsert matching the reference's semantics.
  */
object Sinks {

  /** S6: the 18-column approaches table. Write is partitioned by the
    * bucketed flight id so a 100 TB run produces balanced files and a
    * reader can prune by flight range.
    */
  def writeApproaches(approaches: Dataset[Approach], path: String,
      buckets: Int = 64): Unit =
    approaches
      .drop("unstable_intervals")
      .withColumn("flight_bucket", pmod(col("flight_id"), lit(buckets)))
      .repartition(col("flight_bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("flight_bucket")
      .parquet(path)

  /** S6 incremental: per-key upsert of an 18-column approaches batch
    * into the bucketed parquet table at `path`, matching the
    * reference's `INSERT .. ON DUPLICATE KEY UPDATE` on
    * (flight_id, approach_id) (FlightAnalysis.py:400-431): batch rows
    * replace same-key rows, other rows survive untouched. Stale
    * approach ids a re-run no longer produces also survive — exactly
    * the reference's upsert (it never deletes).
    *
    * 100 TB posture: dynamic partition overwrite rewrites ONLY the
    * flight buckets the batch touches; the existing-table read is
    * partition-pruned to those buckets, and the survivor set (old rows
    * of touched buckets minus batch keys) is eagerly materialized on a
    * persisted RDD — released after the write — to cut lineage from
    * the files being replaced; bounded by touched-bucket size, not
    * table size. The anti join broadcasts the batch's key
    * projection (two small columns). On a lakehouse deployment a table
    * format's MERGE INTO (Delta/Iceberg) replaces this file dance; the
    * semantics here are identical.
    */
  def mergeApproachesTable(batch: DataFrame, path: String,
      buckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    // upsert of nothing is a no-op — and materially so: an empty
    // FIRST batch would otherwise create a file-less table dir that
    // the next merge's read cannot infer a schema from (streaming
    // micro-batches before the first emission hit exactly this)
    if (batch.isEmpty) return
    val newRows = batch
      .withColumn("flight_bucket",
        pmod(col("flight_id"), lit(buckets)).cast("int"))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) {
      newRows.repartition(col("flight_bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("flight_bucket").parquet(path)
      return
    }
    val prevMode =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // bucket ids only — at most `buckets` small values on the driver
      val touched = newRows.select(col("flight_bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val existing = spark.read.parquet(path)
        .filter(col("flight_bucket").isin(touched: _*))
        .withColumn("flight_bucket", col("flight_bucket").cast("int"))
      val survivors = existing.join(
        broadcast(batch.select(col("flight_id"), col("approach_id")).distinct()),
        Seq("flight_id", "approach_id"), "left_anti")
      // Materialize the survivor rows BEFORE the overwrite removes the
      // files they were read from, on a persisted RDD we own: eager
      // count() fills the blocks now, and the finally releases them
      // after the write. (The previous localCheckpoint(true) here
      // leaked its blocks for the JVM lifetime — catalog.clearCache()
      // does not free RDD-level persists — and lossy local checkpoints
      // are the wrong primitive on a real cluster anyway; a table
      // format's MERGE INTO is the production form, see the note
      // above.) MEMORY_AND_DISK: blocks spill rather than drop, so the
      // write never recomputes from the deleted source files.
      val survRdd = survivors.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        survRdd.count()
        spark.createDataFrame(survRdd, survivors.schema)
          .unionByName(newRows)
          .repartition(col("flight_bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("flight_bucket").parquet(path)
      } finally survRdd.unpersist(blocking = false)
    } finally {
      prevMode match {
        case Some(m) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Typed form of [[mergeApproachesTable]]. */
  def mergeApproaches(batch: Dataset[Approach], path: String,
      buckets: Int = 64): Unit =
    mergeApproachesTable(batch.drop("unstable_intervals"), path, buckets)

  /** S8: console sink — the reference prints each approach tuple to
    * stdout as it inserts (FlightAnalysis.py:426-427). Batch form:
    * `show` without truncation (driver-side, debug scale only).
    */
  def printApproaches(df: DataFrame, numRows: Int = 20): Unit =
    df.show(numRows, truncate = false)

  /** S8 streaming twin: the Structured Streaming console sink, for
    * wiring a streamed approaches table to stdout
    * (`consoleStream(df).start()`).
    */
  def consoleStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode("append")

  /** S6 streaming twin: continuous per-key upsert. Each micro-batch
    * runs the SAME merge as the batch path (foreachBatch →
    * [[mergeApproachesTable]]), so a streamed detector feeds the
    * identical bucketed table an incremental batch job would.
    * Structured Streaming replays a micro-batch after a crash
    * (at-least-once), and the merge is a per-key upsert of
    * deterministic rows — idempotent — so replayed BATCHES converge
    * to the same table state. The remaining hole is the merge's own
    * commit: the dynamic-partition overwrite of plain parquet is not
    * atomic, so a crash in the middle of the file swap can lose
    * survivor rows of the touched buckets, and a replay re-merges
    * only the batch's keys. Production deployments close this with
    * an atomic table format (Delta/Iceberg MERGE INTO), the same
    * upgrade path noted on [[mergeApproachesTable]] — idempotency
    * covers replay-after-commit, not crash-during-commit.
    */
  def mergeStream(approaches: DataFrame, path: String,
      buckets: Int = 64): DataStreamWriter[Row] =
    approaches.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        mergeApproachesTable(batch, path, buckets); ()
      }

  /** S6+S7 coupled commit. The reference runs the approaches upsert
    * and the per-flight done-flag update inside ONE DB transaction
    * (FlightAnalysis.py:432-437); parquet has no cross-table
    * transaction, so this helper provides the same effective
    * guarantee by WRITE ORDER plus idempotence:
    *
    *   1. the approaches batch is merged first ([[mergeApproachesTable]]);
    *   2. the done flags are written only after that merge is durable.
    *
    * A crash between the two leaves the flights still PENDING (flag
    * unset), so the work-list re-runs them — and the re-run's merge
    * is a per-key upsert of identical rows, converging to the same
    * table. Net: at-least-once execution, exactly-once table state —
    * the same end state the reference's transaction gives, without
    * claiming atomic visibility (readers can observe merged approaches
    * for a flight whose flag is not yet set; the reverse, a flagged
    * flight with missing approaches, cannot happen). On a lakehouse,
    * a multi-table transaction (or one Delta/Iceberg commit over both
    * tables) replaces this ordering contract.
    */
  def commitFlightAnalysis(batch: DataFrame, flights: DataFrame,
      approachesPath: String, flagsPath: String, buckets: Int = 64): Unit = {
    mergeApproachesTable(batch, approachesPath, buckets)
    writeAnalysisFlags(flights, flagsPath)
  }

  /** S7: the processed-flag table (flight_id, approach_analysis=1).
    * Derived from the *input* flight set, not the approaches output —
    * a flight with zero approaches is still done (py:56-57 runs the
    * update unconditionally).
    */
  def analysisFlags(flights: DataFrame): DataFrame =
    flights.select(col("flight").as("flight_id")).distinct()
      .withColumn("approach_analysis", lit(1))

  def writeAnalysisFlags(flights: DataFrame, path: String): Unit =
    analysisFlags(flights).write.mode(SaveMode.Overwrite).parquet(path)
}
