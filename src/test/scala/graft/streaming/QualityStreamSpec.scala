package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The streaming compression-quality monitor must (1) flag exactly
  * the documents q132's batch flag flags — the payload classes with
  * measured ratios far on both sides of 3.0 — (2) accumulate counts
  * across micro-batches and late-inside-watermark arrivals to equal
  * the batch groupBy, and (3) read out integer divide-first rates
  * with the alert threshold applied.
  */
case class QDoc(ts: Timestamp, source: String, text: String)

class QualityStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def doc(sec: Long, src: String, text: String) =
    QDoc(new Timestamp(sec * 1000), src, text)

  // q132's planted classes: repetitive (ratio > 4.5 measured) and
  // hex-entropy (ratio < 2) — the flag boundary is nowhere near either
  private val rep = "the quick data pipeline " * 8
  private def hex(seed: Int) = (0 until 8).map(k =>
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$k".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString).mkString

  test("streamed counts equal the batch groupBy; finisher rates and alerts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[QDoc]
    val q = QualityStream
      .repetitiveCounts(in.toDS().toDF(), "ts", "source", "text",
        windowLen = "1 minute", watermark = "30 seconds")
      .writeStream.format("memory").queryName("quality_counts")
      .outputMode("append").start()
    // window [60,120): srcA goes boilerplate (3 rep / 1 hex across
    // TWO batches — counts must accumulate; one rep arrives a batch
    // late inside the watermark), srcB stays clean (2 hex).
    // window [120,180): srcA clean (1 hex).
    val batch1 = Seq(doc(61, "srcA", rep), doc(62, "srcA", rep),
      doc(65, "srcA", hex(1)), doc(70, "srcB", hex(2)),
      doc(80, "srcB", hex(3)))
    val late = Seq(doc(75, "srcA", rep))
    val batch2 = Seq(doc(125, "srcA", hex(4)))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(late: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // sentinels push the watermark past both windows (two steps:
      // batch N runs under batch N-1's watermark)
      in.addData(doc(500, "zz", hex(9)))
      q.processAllAvailable()
      in.addData(doc(900, "zz", hex(9)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("quality_counts")
      .filter(col("source") =!= "zz")
    val docs = (batch1 ++ late ++ batch2).toDF()
    val batch = docs
      .groupBy(window(col("ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n"),
        count(when(QualityStream.repetitiveFlag(col("text")), 1))
          .as("n_rep"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed windowed counts diverge from the batch groupBy")

    // finisher: srcA hot window = 4 docs, 3 flagged -> 750000, alert;
    // srcB = 0/2 -> 0, no alert; srcA cold window = 0/1 -> 0
    val out = QualityStream.rateReadout(streamed).collect()
      .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000,
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5)))
    assert(out.toSeq == Seq(
      (60L, "srcA", 4L, 3L, 750000L, 1),
      (60L, "srcB", 2L, 0L, 0L, 0),
      (120L, "srcA", 1L, 0L, 0L, 0)))
  }

  test("the stream's flag is exactly q132's: both planted classes route correctly") {
    import spark.implicits._
    val flags = Seq(rep, "the quick data pipeline " * 24,
      hex(7), hex(8))
      .toDF("text")
      .select(QualityStream.repetitiveFlag(col("text")).as("f"))
      .as[Boolean].collect().toSeq
    assert(flags == Seq(true, true, false, false))
  }

  test("the flag is BYTE-based: repeated CJK flags the same as repeated ASCII") {
    // a 30-distinct-kanji sentence repeated 5x: 150 chars, 450 UTF-8
    // bytes, deflating to roughly one sentence's worth (~75-110
    // bytes) — the BYTE ratio clears 3.0 while the char "ratio"
    // (150 / z) stays under it. This is the exact divergence the
    // shared TextOps.repetitiveFlag definition closed: a char-based
    // numerator under-counts multi-byte text 3x
    import spark.implicits._
    val cjk = "春夏秋冬雨雪風雷山川海空木火土金水月日星雲霧虹朝昼夜東西南北" * 5
    val got = Seq(cjk).toDF("text")
      .select(QualityStream.repetitiveFlag(col("text")).as("f"),
        (length(col("text")) >=
          call_function("deflate_len", col("text")) * 3L).as("charBased"))
      .collect()(0)
    assert(got.getBoolean(0), "byte-based flag must fire on repeated CJK")
    assert(!got.getBoolean(1),
      "the char-based form should NOT fire here — if it does, this " +
        "corpus no longer demonstrates the divergence the shared " +
        "definition guards against")
  }
}
