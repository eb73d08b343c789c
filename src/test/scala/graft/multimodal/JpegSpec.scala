package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.Codecs.ImageStats

/** The q138 oracle rests on one invariant: block-constant grayscale
  * at quality 1.0 round-trips EXACTLY through the JDK's lossy JPEG
  * codec (all AC coefficients identically zero, unit quant tables).
  * This spec pins that invariant for every gray level and for
  * multi-block rasters, plus the decoder's rejection and routing
  * behavior the oracle never sees.
  */
class JpegSpec extends AnyFunSuite {

  test("every gray level 0..255 round-trips exactly (the q138 invariant)") {
    (0 until 256).foreach { v =>
      val jpg = Jpeg.encodeBlockGray(8, 8, _ => v)
      assert(Jpeg.sniff(jpg), s"v=$v: missing FF D8 FF magic")
      val st = Jpeg.decode(jpg).getOrElse(fail(s"v=$v failed to decode"))
      // constant raster: sum = 64v, min = max = v, wsum = v * sum(0..63)
      assert(st == ImageStats(8, 8, 64L * v, v, v, 2016L * v),
        s"gray level $v did not round-trip exactly: $st")
    }
  }

  test("multi-block rasters round-trip exactly, wsum included") {
    // 5x2 blocks with all-distinct values — a permuted block walk
    // (stride bug, bottom-up rows) keeps sum/min/max but breaks wsum
    val w = 40; val h = 16
    val bv = (bi: Int) => (17 + bi * 59) % 256
    val jpg = Jpeg.encodeBlockGray(w, h, bv)
    val st = Jpeg.decode(jpg).get
    var sum = 0L; var wsum = 0L
    var min = Int.MaxValue; var max = Int.MinValue
    var i = 0
    while (i < w * h) {
      val v = bv(((i / w) / 8) * (w / 8) + ((i % w) / 8))
      sum += v; wsum += i.toLong * v
      if (v < min) min = v
      if (v > max) max = v
      i += 1
    }
    assert(st == ImageStats(w, h, sum, min, max, wsum))
  }

  test("color JPEGs reduce through the shared integer luma") {
    // encode an RGB image via the same ImageIO writer (quality path
    // irrelevant here — the reference pixels are read back from the
    // DECODED image, so the test is exact regardless of loss)
    val img = new java.awt.image.BufferedImage(
      16, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 8).foreach { y =>
      (0 until 16).foreach { x =>
        val i = y * 16 + x
        img.getRaster.setSample(x, y, 0, (i * 13) % 256)
        img.getRaster.setSample(x, y, 1, (i * 17) % 256)
        img.getRaster.setSample(x, y, 2, (i * 19) % 256)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpg = bos.toByteArray
    val st = Jpeg.decode(jpg).get
    // independent reference: ImageIO.read + pngLuma over the decoded
    // (lossy) pixels — pins the reduction, not the codec
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    var sum = 0L; var wsum = 0L
    var min = Int.MaxValue; var max = Int.MinValue
    (0 until 8).foreach { y =>
      (0 until 16).foreach { x =>
        val v = Codecs.pngLuma(back.getRaster.getSample(x, y, 0),
          back.getRaster.getSample(x, y, 1),
          back.getRaster.getSample(x, y, 2))
        sum += v; wsum += (y.toLong * 16 + x) * v
        if (v < min) min = v
        if (v > max) max = v
      }
    }
    assert(st == ImageStats(16, 8, sum, min, max, wsum))
  }

  test("malformed payloads decode to None, never throw") {
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes("US-ASCII")).isEmpty)
    // SOI magic alone: sniff passes, the reader must reject
    assert(Jpeg.decode(Array(0xff, 0xd8, 0xff).map(_.toByte)).isEmpty)
    val ok = Jpeg.encodeBlockGray(16, 8, bi => bi * 40)
    // truncated right after the signature: headers incomplete
    assert(Jpeg.decode(ok.take(8)).isEmpty)
  }

  test("header-declared rasters past the wsum bound reject before pixel decode") {
    val ok = Jpeg.encodeBlockGray(16, 8, _ => 100)
    // patch the SOF0 frame header (FF C0, then len u16, precision u8,
    // height u16, width u16) to declare 16384 x 16384 = 2^28 pixels —
    // over MaxStatPixels; the entropy stream is untouched, so only
    // the header bound can reject this
    val sof = (0 until ok.length - 1).find(i =>
      ok(i) == 0xff.toByte && ok(i + 1) == 0xc0.toByte).get
    val big = ok.clone()
    big(sof + 5) = 0x40; big(sof + 6) = 0
    big(sof + 7) = 0x40; big(sof + 8) = 0
    assert(Jpeg.decode(big).isEmpty)
  }

  test("reader handle is reusable across a batch, bad items included") {
    val h = new Jpeg.Handle
    try {
      val a = Jpeg.encodeBlockGray(8, 8, _ => 3)
      val b = Jpeg.encodeBlockGray(16, 16, bi => 50 + bi)
      assert(Jpeg.decodeWith(h, a).get == ImageStats(8, 8, 192, 3, 3, 6048))
      // a malformed item mid-batch must not poison the handle
      assert(Jpeg.decodeWith(h, Array(0xff, 0xd8, 0xff, 0x00)
        .map(_.toByte)).isEmpty)
      val st = Jpeg.decodeWith(h, b).get
      assert(st.width == 16 && st.height == 16 && st.min == 50)
      // and the same payload decodes identically through a fresh handle
      assert(Jpeg.decode(b).contains(st))
    } finally h.close()
  }

  test("planted corpus decodes to the closed-form oracle stats end-to-end") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = spark.range(60).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"))
    val rows = BatchedDecode.decodeStats(
      MultimodalOps.jpegMediaFromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(rows.length == 60)
    rows.foreach { r =>
      val id = r.media_id
      val w = (16 + (id % 3) * 8).toInt
      val ht = (8 + (id % 2) * 8).toInt
      var sum = 0L; var wsum = 0L
      var min = Int.MaxValue; var max = Int.MinValue
      var i = 0
      while (i < w * ht) {
        val bi = ((i / w) / 8) * (w / 8) + ((i % w) / 8)
        val v = ((id * 41 + bi * 59L) % 256).toInt
        sum += v; wsum += i.toLong * v
        if (v < min) min = v
        if (v > max) max = v
        i += 1
      }
      assert(r == DecodedStats(id, "jpg", w.toLong, ht.toLong,
        w.toLong * ht, sum, min.toLong, max.toLong, wsum),
        s"doc $id diverged from the closed-form oracle")
    }
  }
}
