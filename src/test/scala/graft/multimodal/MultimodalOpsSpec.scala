package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.MultimodalOps._

class MultimodalOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("encode -> decode metadata round-trip on crafted values") {
    import spark.implicits._
    val df = Seq(("hello world payload", 2, 640, 480, 24))
      .toDF("body", "kind", "w", "h", "nf")
      .select(encodeMedia(col("kind"), col("w"), col("h"), col("nf"),
        encode(col("body"), "UTF-8")).as("payload"))
      .select(decodeMeta(col("payload")).as("meta"))
    val m = df.select("meta.kind", "meta.width", "meta.height",
      "meta.n_frames", "meta.body_bytes").collect().head
    assert(m.getLong(0) == 2 && m.getLong(1) == 640 && m.getLong(2) == 480)
    assert(m.getLong(3) == 24)
    assert(m.getLong(4) == "hello world payload".length)
  }

  test("decodeMeta rejects payloads without the magic header") {
    import spark.implicits._
    val bad = Seq("XXnot-a-media-file").toDF("s")
      .select(decodeMeta(encode(col("s"), "UTF-8")).as("meta"))
    assert(bad.filter(col("meta").isNull).count() == 1)
  }

  test("sampleFrames: byte ranges, frame cap, short-body edge") {
    import spark.implicits._
    val payload = encodeMedia(lit(2), lit(64), lit(48), lit(9),
      encode(lit("0123456789abcdefXYZ"), "UTF-8")) // 19-byte body
    val frames = Seq(1).toDF("d")
      .select(sampleFrames(payload, 8, 4).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    // floor(19/8) = 2 frames of 8 bytes
    assert(frames.length == 2)
    assert(new String(frames.head, "UTF-8") == "01234567")
    assert(new String(frames(1), "UTF-8") == "89abcdef")
    val none = Seq(1).toDF("d")
      .select(sampleFrames(encodeMedia(lit(0), lit(1), lit(1), lit(1),
        encode(lit("abc"), "UTF-8")), 8, 4).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(none.isEmpty)
  }

  test("batched decode agrees with the column-expression header parse") {
    import spark.implicits._
    val media = MultimodalOps.mediaFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val decoded = BatchedDecode.decodeBatched(media, batchSize = 7)
    // independent implementations of the same header layout must agree
    val viaColumns = media
      .withColumn("meta", decodeMeta(col("payload")))
      .select(col("media_id").cast("long").as("media_id"),
        col("meta.kind").as("kind"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_frames").as("n_frames"),
        col("meta.body_bytes").as("body_bytes"))
    val mismatches = decoded.toDF()
      .drop("luma_e4")
      .except(viaColumns)
    assert(mismatches.isEmpty, "batched decode diverges from decodeMeta")
    assert(decoded.count() == media.count(), "batched decode dropped rows")
    // a batch size that doesn't divide the partition row count must
    // still decode every row (the trailing short batch)
    assert(BatchedDecode.decodeBatched(media, batchSize = 1000).count() ==
      media.count())
  }

  test("batched decode drops payloads that fail the magic check") {
    import spark.implicits._
    val bad = Seq((1L, "XXnot-a-media-file"), (2L, "G"))
      .toDF("media_id", "s")
      .select(col("media_id"), encode(col("s"), "UTF-8").as("payload"))
    assert(BatchedDecode.decodeBatched(bad).count() == 0)
  }

  test("resizeMeta scales the long edge to maxDim, keeps small images") {
    import spark.implicits._
    val meta = struct(lit(2L).as("kind"), lit(640L).as("width"),
      lit(480L).as("height"), lit(1L).as("n_frames"), lit(0L).as("body_bytes"))
    val r = Seq(1).toDF("d").select(resizeMeta(meta, 32).as("r"))
      .select("r.width", "r.height").collect().head
    assert(r.getLong(0) == 32 && r.getLong(1) == 24)
    val small = struct(lit(0L).as("kind"), lit(16L).as("width"),
      lit(8L).as("height"), lit(1L).as("n_frames"), lit(0L).as("body_bytes"))
    val s = Seq(1).toDF("d").select(resizeMeta(small, 32).as("r"))
      .select("r.width", "r.height").collect().head
    assert(s.getLong(0) == 16 && s.getLong(1) == 8)
  }
}
