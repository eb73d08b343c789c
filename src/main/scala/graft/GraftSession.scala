package graft

import org.apache.spark.sql.SparkSession

/** The one place the driver-tool session invariants live. Every
  * driver main (Bench/Verify/QTime/QDump/DbgPlan/ScaleBench/
  * ShuffleReport/DumpPlans/ClusterStream) builds through here so the
  * invariants can't drift per-file — the ADVICE-r9 bug (one driver
  * missing the UTC pin made timestamp-literal results depend on which
  * query ran first on non-UTC hosts) was only fixable one file at a
  * time because each tool owned its own builder block.
  *
  * Invariants: UTC session timezone at construction (never as a
  * mid-run side effect), shuffle partitions sized to the thread
  * count (not Spark's default 200 — at local[k] that's k; on a real
  * cluster the submitter overrides), UI off (headless tools).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
