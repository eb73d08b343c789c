package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming quantiles via the q89 HDR bucket histogram — the
  * streaming member of the sketch family (the batch twin is
  * `Relational.q89`; same log2-octave / 64-sub-bucket geometry, same
  * integer-only bucket arithmetic).
  *
  * Why this shape streams: the sketch state is (bucket -> count),
  * and counts ADD — the aggregation is associative, commutative, and
  * idempotent-under-replay in exactly the way Structured Streaming's
  * stateful agg needs, so per-window quantiles fall out of a plain
  * watermark + window groupBy with bounded state (<= ~64 buckets per
  * octave per window), no custom state machine. A percentile-exact
  * operator has no such decomposition — THE reason production
  * streaming quantiles are sketches.
  *
  * Scale posture: bucket assignment is map-only; each micro-batch
  * shuffles one (window, s, m, partial-count) row per occupied
  * bucket per task; state-store rows = occupied buckets per open
  * window. The finisher runs on the bucket table — thousands of
  * rows, not the stream.
  */
object SketchStream {

  /** The q89 bucket key for a positive long column: scale
    * s = max(bitlen-1-6, 0), mantissa m = n >> s (top 7 bits).
    */
  private def withBuckets(df: DataFrame, n: Column): DataFrame = {
    val e = (length(bin(n)) - 1).cast("long")
    df.withColumn("s", greatest(e - 6, lit(0L)).cast("int"))
      .withColumn("m", call_function("shiftright", n, col("s")))
  }

  /** Streaming per-window bucket histogram: tumbling `windowLen`
    * windows over `tsCol`, watermarked, counting occupied (s, m)
    * buckets of `valCol` (positive longs).
    */
  def bucketCounts(values: DataFrame, tsCol: String, valCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours")
      : DataFrame =
    withBuckets(values.withWatermark(tsCol, watermark),
        col(valCol).cast("long"))
      .groupBy(window(col(tsCol), windowLen), col("s"), col("m"))
      .agg(count(lit(1)).as("c"))

  /** Batch finisher (foreachBatch / post-query): percentile estimates
    * from a bucket table — q89's extraction on (key..., s, m, c):
    * order buckets by lo, walk the cumulative counts to rank
    * ceil(p*n), report the bucket midpoint. Integer-exact; `keys`
    * are carried through (e.g. the window column).
    */
  def quantilesFromBuckets(buckets: DataFrame, keys: Seq[String],
      ps: Seq[Int]): DataFrame = {
    val k = keys.map(col)
    val lo = call_function("shiftleft", col("m"), col("s"))
    val hi = call_function("shiftleft", col("m") + 1, col("s")) - 1
    val wCum = Window.partitionBy(k: _*).orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .withColumn("lo", lo).withColumn("hi", hi)
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wAll))
      .select(k :+ col("cum") :+ col("total") :+
        ((col("lo") + col("hi")).cast("long")).as("lohi") :+
        explode(array(ps.map(p => lit(p.toLong)): _*)).as("p"): _*)
      .withColumn("rank", expr("(total * p + 99) DIV 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(k :+ col("p") :+ col("total"): _*)
      .agg(min(expr("lohi DIV 2")).as("est"))
  }
}
