package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Compaction must shrink the file count to the byte target, keep the
  * data bit-identical, tighten per-file min/max when sorted — and
  * survive a crash at every point of its swap window.
  */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parquetFiles(dir: String): Seq[String] =
    fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSeq

  private def writeFragmented(dir: String): Unit = {
    import spark.implicits._
    // 200 files of 50 rows each — the post-ingest shape
    (0L until 10000L).map(i => (i, s"row-$i")).toDF("k", "s")
      .repartition(200)
      .write.parquet(dir)
  }

  test("compacts to the byte target, data identical, sorted files disjoint") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    writeFragmented(dir)
    val before = parquetFiles(dir).size
    assert(before > 50, s"fixture should be fragmented, got $before files")
    val total = fs.getContentSummary(new Path(dir)).getLength
    val n = Compaction.compact(spark, dir, targetBytes = total / 4 + 1,
      sortCols = Seq("k"))
    assert(n <= 5, s"expected ~4 output files, got $n")
    assert(parquetFiles(dir).size == n)
    // bit-identical content
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.length == 10000 && got.head == (0L, "row-0") &&
      got.last == (9999L, "row-9999"))
    // sorted compaction: per-file key ranges must be disjoint (the
    // min/max-pruning property the re-sort exists for)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file key ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("interrupted swap heals: parked-without-live rolls forward or back") {
    import spark.implicits._
    val dir = Files.createTempDirectory("crash").toString + "/t"
    writeFragmented(dir)
    val expect = spark.read.parquet(dir).count()

    // simulate a crash AFTER park, BEFORE promote: live gone, staged
    // rewrite complete — recovery must roll FORWARD to the new layout
    val staged = dir + ".__compact"
    spark.read.parquet(dir).repartition(2)
      .write.parquet(staged)
    assert(fs.rename(new Path(dir), new Path(dir + ".__old")))
    Compaction.recoverInterrupted(fs, dir)
    assert(fs.exists(new Path(dir)) && !fs.exists(new Path(staged)) &&
      !fs.exists(new Path(dir + ".__old")))
    assert(spark.read.parquet(dir).count() == expect)

    // simulate a crash after park with NO staging (rewrite unfinished,
    // staging discarded): recovery must roll BACK to the old layout
    assert(fs.rename(new Path(dir), new Path(dir + ".__old")))
    Compaction.recoverInterrupted(fs, dir)
    assert(fs.exists(new Path(dir)))
    assert(spark.read.parquet(dir).count() == expect)

    // and a normal compact after all that still works
    val n = Compaction.compact(spark, dir,
      targetBytes = Long.MaxValue, sortCols = Seq("k"))
    assert(n == 1 && spark.read.parquet(dir).count() == expect)
  }
}
