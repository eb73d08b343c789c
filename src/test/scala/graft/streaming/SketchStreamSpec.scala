package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming quantile sketch: windows close on the watermark, the
  * closed window's bucket table equals the batch computation over the
  * same rows, and the finisher's estimates meet q89's error bound
  * against exact order statistics.
  */
class SketchStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val Base = 86400000L
  private def ts(min: Long) = new Timestamp(Base + min * 60000L)

  // hour-0 values: a two-decade spread so several octaves are occupied
  private val hour0 = (1 to 500).map(i => (i * 97L) % 90000 + 100)

  test("closed window's buckets match batch; estimates meet the q89 bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val values = in.toDF().toDF("ts", "v")
    val q = SketchStream.bucketCounts(values, "ts", "v", "1 hour", "1 hour")
      .writeStream.format("memory").queryName("sketch_buckets")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(hour0.zipWithIndex.map { case (v, i) =>
        (ts(i % 60), v)
      }: _*)
      q.processAllAvailable()
      assert(spark.table("sketch_buckets").count() == 0,
        "window emitted before the watermark passed it")
      in.addData((ts(200), 5000L)) // advance watermark past hour 0
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sketch_buckets")
      .select("s", "m", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch twin over the same rows, same expressions
    val e = (length(bin(col("v"))) - 1).cast("long")
    val batch = hour0.toDF("v")
      .withColumn("s", greatest(e - 6, lit(0L)).cast("int"))
      .withColumn("m", call_function("shiftright", col("v"), col("s")))
      .groupBy("s", "m").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      "streamed bucket histogram diverges from the batch computation")

    val est = SketchStream.quantilesFromBuckets(
        spark.table("sketch_buckets").drop("window"),
        keys = Seq.empty, ps = Seq(50, 90, 99))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("est")).toMap
    val sorted = hour0.sorted
    for (p <- Seq(50, 90, 99)) {
      val exact = sorted((p * sorted.size + 99) / 100 - 1)
      val err = math.abs(est(p) - exact).toDouble / exact
      assert(err <= 0.009,
        f"p$p: est ${est(p)} vs exact $exact (err ${err * 100}%.2f%%)")
    }
  }
}
