package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("zOrderCode: golden interleavings") {
    import spark.implicits._
    // morton(3, 5): x=011 -> bits 0,2 at even slots = 1+4;
    // y=101 -> bits 0,2 at odd slots = 2+32 -> 39
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (1023, 1023))
      .toDF("x", "y")
      .select(ZOrder.zOrderCode(col("x"), col("y"), 10))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, (1L << 20) - 1))
  }

  test("quantize: clamps below/above and hits the full grid") {
    import spark.implicits._
    val got = Seq(-200.0, -90.0, 0.0, 89.99, 90.0, 200.0).toDF("v")
      .select(ZOrder.quantize(col("v"), -90, 90, 10))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got(1) == 0L)
    assert(got(2) == 512L)
    assert(got(3) == 1023L && got(4) == 1023L && got.last == 1023L)
  }

  test("zOrder layout strictly beats a linear sort on file-skip for the non-sort dim") {
    import spark.implicits._
    // 10k uniform points, many small files per layout; the payoff
    // measure is the scan-pruning emulation: a reader prunes every
    // file whose per-file [min,max] box misses the predicate — so
    // count surviving files per layout for the same predicate.
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(10000)((rnd.nextDouble(), rnd.nextDouble()))
      .toDF("x", "y")
    val root = java.nio.file.Files.createTempDirectory("zpay").toString
    val (zDir, linDir) = (s"$root/zorder", s"$root/linear")
    val files = 20
    ZOrder.zOrderBy(pts, col("x"), 0, 1, col("y"), 0, 1,
        bits = 8, partitions = files)
      .write.parquet(zDir)
    // the linear strawman: same file count, range-sorted on x only
    pts.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(linDir)

    def stats(dir: String): Array[(Double, Double, Double, Double)] =
      spark.read.parquet(dir).groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect()
        .map(r => (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
    def surviving(dir: String, xLo: Double, xHi: Double,
        yLo: Double, yHi: Double): Int =
      stats(dir).count { case (x0, x1, y0, y1) =>
        x1 >= xLo && x0 <= xHi && y1 >= yLo && y0 <= yHi }

    assert(stats(zDir).length == files && stats(linDir).length == files)
    // predicate on y alone: the x-sorted layout can prune NOTHING
    // (every file spans y's full range); the Z-order layout must
    val zY = surviving(zDir, 0, 1, 0.45, 0.55)
    val linY = surviving(linDir, 0, 1, 0.45, 0.55)
    assert(linY == files, s"x-sorted files should all span y: $linY")
    assert(zY < linY, s"zorder=$zY vs linear=$linY files for the y predicate")
    // 2-D box: at 20-file granularity a linear x-sort is competitive
    // on a box (it prunes its sort dim as well as anything), so the
    // honest claim is robustness ACROSS predicates — the Z layout
    // still prunes most files for the box, and over the two predicate
    // shapes combined it reads strictly fewer files than the
    // single-dim layout
    val zBox = surviving(zDir, 0.4, 0.6, 0.4, 0.6)
    val linBox = surviving(linDir, 0.4, 0.6, 0.4, 0.6)
    assert(zBox < files / 2, s"box predicate should prune most files: $zBox")
    assert(zY + zBox < linY + linBox,
      s"z=$zY+$zBox vs linear=$linY+$linBox across predicate shapes")
    // and both layouts return identical rows for the box predicate
    val q = (d: String) => spark.read.parquet(d)
      .filter(col("x").between(0.4, 0.6) && col("y").between(0.45, 0.55))
      .count()
    assert(q(zDir) == q(linDir))
  }

  test("Spark's OWN parquet reader skips Z-pruned files (scan metrics, not emulation)") {
    import spark.implicits._
    // End-to-end through the real FileSourceScanExec: Spark lists
    // every file (numFiles is layout-blind), but the pushed-down
    // predicate lets the parquet reader drop whole ROW GROUPS from
    // footer min/max before decoding. Each file below holds exactly
    // one row group (asserted from the footers), so row groups
    // skipped == files skipped, and the scan's numOutputRows metric
    // (rows the reader actually decoded, pre-Spark-filter) is the
    // file-skip payoff measured by Spark's own machinery.
    // NOTE on thresholds: repartitionByRange samples with an UNSEEDED
    // random, so the file boundaries (and with them the exact number
    // of skippable files) jitter run to run — 32 files and 3/4-style
    // bounds leave that jitter well clear of the assertions, while
    // the load-bearing exactness claim (decoded rows == the footers'
    // prediction) is unaffected by where the boundaries land
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(10000)((rnd.nextDouble(), rnd.nextDouble()))
      .toDF("x", "y")
    val root = java.nio.file.Files.createTempDirectory("zreal").toString
    val (zDir, linDir) = (s"$root/zorder", s"$root/linear")
    val files = 32
    ZOrder.zOrderBy(pts, col("x"), 0, 1, col("y"), 0, 1,
        bits = 8, partitions = files)
      .write.parquet(zDir)
    pts.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(linDir)

    val (yLo, yHi) = (0.45, 0.55)

    // footer ground truth: per-file row count and y-range from the
    // real parquet metadata (what the reader's row-group skip uses)
    def footerStats(dir: String): Seq[(Long, Double, Double)] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles
        .filter(f => f.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val in = HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf)
          val reader = ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks
            assert(blocks.size == 1,
              s"${f.getName}: expected 1 row group, got ${blocks.size}")
            val yStats = blocks.get(0).getColumns.asScala
              .find(_.getPath.toDotString == "y").get.getStatistics
            (blocks.get(0).getRowCount,
              yStats.genericGetMin.asInstanceOf[Double],
              yStats.genericGetMax.asInstanceOf[Double])
          } finally reader.close()
        }
    }

    // run the y-predicate through the real reader and harvest the
    // scan node's OWN metrics after execution
    def scanMetrics(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("y") >= yLo && col("y") <= yHi)
      df.collect()
      val scan = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s } match {
          case Seq(s) => s
          case other => fail(s"expected one FileSourceScanExec, got $other")
        }
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(y,"),
        s"y predicate must reach the parquet scan: ${scan.metadata("PushedFilters")}")
      (scan.metrics("numFiles").value, scan.metrics("numOutputRows").value)
    }

    val zStats = footerStats(zDir); val linStats = footerStats(linDir)
    val surviving = (s: Seq[(Long, Double, Double)]) =>
      s.filter { case (_, lo, hi) => hi >= yLo && lo <= yHi }
    val zSurvive = surviving(zStats); val linSurvive = surviving(linStats)
    // the x-sorted layout's files all span y: nothing skippable
    assert(linSurvive.size == files,
      s"linear layout should have no skippable file, ${linSurvive.size}")
    assert(zSurvive.size <= files * 3 / 4,
      s"Z layout should leave files skippable: ${zSurvive.size}/$files")

    val (zFiles, zRows) = scanMetrics(zDir)
    val (linFiles, linRows) = scanMetrics(linDir)
    // listing is layout-blind — the skip happens INSIDE the reader
    assert(zFiles == files && linFiles == files)
    // linear: every row group survives, the reader decodes all rows
    assert(linRows == 10000L,
      s"linear layout should decode everything: $linRows")
    // Z: the reader decodes exactly the surviving row groups' rows —
    // i.e. it really skipped the files the footers say it could
    assert(zRows == zSurvive.map(_._1).sum,
      s"scan decoded $zRows rows vs footer-predicted ${zSurvive.map(_._1).sum}")
    assert(zRows <= linRows * 3 / 4,
      s"Z layout should decode far fewer rows: $zRows vs $linRows")
    // same answer from both layouts, through the same real reader
    val q = (d: String) => spark.read.parquet(d)
      .filter(col("y") >= yLo && col("y") <= yHi).count()
    assert(q(zDir) == q(linDir))
  }

  test("zOrderBy: partitions cover disjoint, contiguous Z-curve segments") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(2000)((rnd.nextDouble() * 180 - 90,
      rnd.nextDouble() * 360 - 180)).toDF("lat", "lon")
    val laid = ZOrder.zOrderBy(pts, col("lat"), -90, 90,
      col("lon"), -180, 180, bits = 10, partitions = 8)
    // recompute the code per row and check each partition holds one
    // non-overlapping zcode interval — the property min/max pruning
    // needs from the written files
    val ranges = laid
      .withColumn("z", ZOrder.zOrderCode(
        ZOrder.quantize(col("lat"), -90, 90, 10).cast("int"),
        ZOrder.quantize(col("lon"), -180, 180, 10).cast("int"), 10))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == 2000)
    assert(ranges.length > 1, "expected multiple range partitions")
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2, s"partition zcode ranges overlap: $ranges")
      case _ =>
    }
  }
}
