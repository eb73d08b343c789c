package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out for CPU-heavy map fronts (optimization
  * guide §2.5 "input skew" / §6 input splits): a per-row-expensive
  * pipeline (page build + HTML extraction, payload encode + codec
  * decode) inherits the SCAN's partitioning, and a parquet table that
  * is one rowgroup is UNSPLITTABLE — splitting confs cannot help, so
  * the whole pipeline runs in ONE task while the rest of the machine
  * idles (measured: every bench fixture table is a single rowgroup;
  * q142's extraction ran 1-task at ~4.3 s where 32-way runs ~1 s).
  *
  * The guide's remedy for unsplittable input is "repartition
  * immediately after the read", made scale-adaptive here: fan out
  * ONLY when the scan yields fewer partitions than half the session's
  * parallelism. At production scale inputs carry many
  * rowgroups/files, the condition is false and the plan is untouched
  * — no extra exchange ever reaches a 100 TB run. On single-rowgroup
  * inputs the condition binds and the narrow SEED rows (doc_id +
  * text) cross one round-robin exchange BEFORE pages/payloads are
  * constructed — heavy bytes are still born in their final partition
  * and never shuffle, so the "payloads never shuffle" posture is
  * preserved (PlanSpec counts this exchange explicitly).
  *
  * Determinism under retry: round-robin repartition sorts its input
  * first (spark.sql.execution.sortBeforeRepartition, default on), so
  * re-run tasks reproduce the same row placement.
  */
object ScanFanOut {
  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, cores / 2)) df
    else df.repartition(cores)
  }
}
