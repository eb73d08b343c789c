package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The streaming skew monitor's windowed count table must equal the
  * batch groupBy on the same events — including keys whose counts
  * accumulate across micro-batches and late arrivals inside the
  * watermark — and the finisher must reproduce q106's readout
  * (divide-first skew formula, tie-broken top keys).
  */
case class KEvent(ts: Timestamp, user_id: Long)

class SkewStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def ev(sec: Long, u: Long) = KEvent(new Timestamp(sec * 1000), u)

  test("streamed per-window counts equal the batch groupBy; finisher matches q106's formula") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[KEvent]
    val q = SkewStream
      .keyCounts(in.toDS().toDF(), "ts", "user_id",
        windowLen = "1 minute", watermark = "30 seconds")
      .writeStream.format("memory").queryName("skew_counts")
      .outputMode("append").start()
    // window [60,120): key 7 hot (x3 across TWO batches — state must
    // accumulate), keys 8/9 cold; the t=70 row arrives a batch late
    // but inside the watermark. window [120,180): uniform.
    val batch1 = Seq(ev(61, 7), ev(62, 7), ev(65, 8), ev(110, 9))
    val late = Seq(ev(70, 7))
    val batch2 = Seq(ev(125, 1), ev(130, 2))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(late: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // sentinels push the watermark past both windows so append
      // emits them (two steps: the second batch runs with the first's
      // watermark applied)
      in.addData(ev(500, 999))
      q.processAllAvailable()
      in.addData(ev(900, 999))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("skew_counts")
      .filter(col("key_id") =!= 999)
    val events = (batch1 ++ late ++ batch2).toDF()
    val batch = events
      .groupBy(window(col("ts"), "1 minute"), col("user_id").as("key_id"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed windowed counts diverge from the batch groupBy")

    // finisher on the streamed counts: hot window reads 7=3, 8=1, 9=1
    val out = SkewStream.skewFromCounts(streamed, topN = 2).collect()
      .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000,
        r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3)))
    val hot = out.filter(_._1 == 60)
    // top-2 of (3,1,1): key 7 first, then the tie between 8 and 9
    // breaks to the smaller key id
    assert(hot.filter(_._2 == "top_key").map(t => (t._3.get, t._4)).toSeq ==
      Seq((7L, 3L), (8L, 1L)))
    // total=5, d=3, mx=3 -> mean floor 1 -> skew 3000
    assert(hot.collect { case (_, "skew_x1000", _, n) => n }.toSeq == Seq(3000L))
    val uniform = out.filter(_._1 == 120)
    assert(uniform.collect { case (_, "skew_x1000", _, n) => n }.toSeq ==
      Seq(1000L), "a uniform window must read exactly 1000")
  }
}
