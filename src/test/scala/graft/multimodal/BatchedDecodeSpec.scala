package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.MultimodalOps._

/** The decoder plug-in seam must behave like a real codec boundary:
  * one handle opened per batch (not per item, not per partition),
  * reused across the batch — proven by injecting a counting factory
  * at the documented ===STUB=== seam.
  */
class BatchedDecodeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("codec factory runs once per 64-item batch and results are unchanged") {
    import spark.implicits._
    // 200 payloads in ONE partition -> ceil(200/64) = 4 batches
    val media = spark.range(200)
      .select(col("id").as("media_id"),
        encodeMedia(lit(1), lit(8), lit(8), lit(1),
          encode(concat(lit("body-"), col("id")), "UTF-8")).as("payload"))
      .repartition(1)
    BatchedDecodeSpec.opened.set(0)
    val probed = BatchedDecode.decodeBatched(media, 64, () => {
      BatchedDecodeSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).collect()
    assert(probed.length == 200)
    assert(BatchedDecodeSpec.opened.get() == 4,
      s"expected 4 codec opens for 200 rows / 64, got ${BatchedDecodeSpec.opened.get()}")
    // the injected handle must produce byte-identical output to the
    // default path (the seam only swaps the handle, never the logic)
    val dflt = BatchedDecode.decodeBatched(media, 64).collect()
    assert(probed.sortBy(_.media_id).toSeq == dflt.sortBy(_.media_id).toSeq)
  }

  test("partitioning bounds the codec opens, not the row count") {
    import spark.implicits._
    val media = spark.range(100)
      .select(col("id").as("media_id"),
        encodeMedia(lit(1), lit(8), lit(8), lit(1),
          encode(concat(lit("b"), col("id")), "UTF-8")).as("payload"))
      .repartition(4)
    BatchedDecodeSpec.opened.set(0)
    val n = BatchedDecode.decodeBatched(media, 64, () => {
      BatchedDecodeSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).count()
    assert(n == 100)
    // 4 partitions x ceil(~25/64) = one open per non-empty partition
    assert(BatchedDecodeSpec.opened.get() == 4,
      s"expected one codec open per partition, got ${BatchedDecodeSpec.opened.get()}")
  }

  test("real-decoder path: same one-handle-per-batch seam, sniffed routing") {
    import spark.implicits._
    // 200 payloads, one partition: PGM / WAV / GM / junk round-robin
    val media = spark.range(200).as[Long].map { id =>
      val p = (id % 4) match {
        case 0 => Codecs.encodePgm(5, 4, i => ((id + i * 3) % 256).toInt)
        case 1 => Codecs.encodeWav(8000, 10, i => (id * 7 + i).toInt)
        case 2 =>
          val b = s"vid-$id".getBytes("UTF-8")
          val gm = new Array[Byte](HeaderBytes + b.length)
          gm(0) = 'G'; gm(1) = 'M'
          gm(5) = 9; gm(7) = 7; gm(9) = 1 // width 9, height 7, 1 frame
          System.arraycopy(b, 0, gm, HeaderBytes, b.length)
          gm
        case _ => s"not-a-media-file-$id".getBytes("UTF-8")
      }
      (id, p)
    }.toDF("media_id", "payload").repartition(1)
    BatchedDecodeSpec.opened.set(0)
    val rows = BatchedDecode.decodeStats(media, 64, () => {
      BatchedDecodeSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).collect().sortBy(_.media_id)
    // junk dropped: 150 claimed payloads out of 200
    assert(rows.length == 150)
    assert(BatchedDecodeSpec.opened.get() == 4,
      s"expected 4 fallback opens for 200 rows / 64, got ${BatchedDecodeSpec.opened.get()}")
    // spot-verify each route against a direct Codecs decode
    val pgm = rows.find(_.media_id == 8).get
    val img = Codecs.decodePgm(
      Codecs.encodePgm(5, 4, i => ((8 + i * 3) % 256).toInt)).get
    assert(pgm == DecodedStats(8, "pgm", 5, 4, 20, img.sum,
      img.min.toLong, img.max.toLong, img.wsum))
    val wav = rows.find(_.media_id == 9).get
    val aud = Codecs.decodeWav(
      Codecs.encodeWav(8000, 10, i => (9 * 7 + i).toInt)).get
    assert(wav == DecodedStats(9, "wav", 8000, 1, 10, aud.sumAbs,
      aud.min.toLong, aud.max.toLong, aud.wsum))
    val gm = rows.find(_.media_id == 10).get
    assert(gm.fmt == "gm" && gm.w == 9 && gm.h == 7 &&
      gm.n_units == "vid-10".length && gm.min_val == 0 && gm.max_val == 0)
    // injected handle produces byte-identical output to the default
    val dflt = BatchedDecode.decodeStats(media, 64).collect()
      .sortBy(_.media_id)
    assert(rows.toSeq == dflt.toSeq)
  }
}

/** JVM-wide probe counter — local[*] tests share the JVM, so the
  * executor-side increments land here.
  */
object BatchedDecodeSpec {
  val opened = new AtomicInteger(0)
}
