package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the unglamorous operator every long-lived
  * 100 TB table needs: streaming ingest and incremental merges leave
  * thousands of KB-sized files per partition, and scan cost becomes
  * file-OPEN bound (driver listing, footer reads, task scheduling)
  * instead of byte bound. Compaction rewrites a parquet dir into
  * ~`targetBytes` files, optionally re-sorting so per-file min/max
  * stats stay tight (compose with [[ZOrder.zOrderBy]] for
  * multi-dimensional layouts).
  *
  * Crash safety follows the merge sink's protocol shape: the rewrite
  * lands in a staging sibling (the live dir is only READ), then a
  * park-and-promote rename swap — interrupted at any point, the live
  * dir is either wholly old or wholly new, and [[recoverInterrupted]]
  * (run at every compact start) heals a half-finished swap. Unlike
  * the keyed merge there is no per-bucket granularity: the swap is
  * two renames, so the vulnerable window is O(1) filesystem calls.
  */
object Compaction {

  private def stagingOf(path: String) = new Path(path + ".__compact")
  private def parkedOf(path: String) = new Path(path + ".__old")

  /** Number of output files that lands each at ~`targetBytes` of the
    * dir's CURRENT on-disk size (parquet-to-parquet compaction keeps
    * encoding, so in-size ≈ out-size).
    */
  private[operators] def targetFileCount(fs: FileSystem, path: String,
      targetBytes: Long): Int = {
    val size = fs.getContentSummary(new Path(path)).getLength
    math.max(1, math.ceil(size.toDouble / targetBytes).toInt)
  }

  /** Heal an interrupted [[compact]]: a parked-but-unpromoted state is
    * rolled forward (staging complete implies the rewrite finished),
    * any other leftover is rolled back by discard. Idempotent.
    */
  def recoverInterrupted(fs: FileSystem, path: String): Unit = {
    val live = new Path(path)
    val staging = stagingOf(path)
    val parked = parkedOf(path)
    if (!fs.exists(live) && fs.exists(parked)) {
      // crashed between park and promote: if the finished staging dir
      // is present, promote it (roll forward); else restore the old
      if (fs.exists(staging)) require(fs.rename(staging, live),
        s"compaction recovery: promote $staging -> $live failed")
      else require(fs.rename(parked, live),
        s"compaction recovery: restore $parked -> $live failed")
    }
    if (fs.exists(parked) && fs.exists(live)) fs.delete(parked, true)
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  /** Compact the parquet dir at `path` to ~`targetBytes` files,
    * sorted by `sortCols` (range-partitioned so files hold disjoint
    * key ranges — tight min/max) or hash-distributed when no sort is
    * given. Returns the output file count.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): Int = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverInterrupted(fs, path)
    val n = targetFileCount(fs, path, targetBytes)
    val df = spark.read.parquet(path)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    val staging = stagingOf(path)
    laid.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // the swap: park old, promote staged, drop the parked copy last
    val parked = parkedOf(path)
    if (fs.exists(parked)) fs.delete(parked, true)
    require(fs.rename(new Path(path), parked),
      s"compaction: park $path failed — live dir untouched, aborting")
    require(fs.rename(staging, new Path(path)),
      s"compaction: promote $staging failed — recoverInterrupted will " +
        "roll forward on the next compact")
    fs.delete(parked, true)
    n
  }
}
