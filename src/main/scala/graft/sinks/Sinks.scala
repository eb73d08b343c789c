package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.model.Approach

/** Output sinks (SURVEY.md §2.1 S6/S7). The reference upserts into
  * MySQL (`INSERT .. ON DUPLICATE KEY UPDATE`, FlightAnalysis.py:
  * 400-431) and flips a per-flight done flag (py:432-437) — Spark has
  * no multi-table transaction, so both outputs are snapshot parquet
  * tables: each write REPLACES the whole table with this batch's
  * rows (idempotent for re-runs of the same batch; NOT a per-key
  * merge — incremental batches must target distinct paths or use a
  * table format with MERGE semantics).
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
