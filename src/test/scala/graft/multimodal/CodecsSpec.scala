package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Codecs._

/** The pure-JVM PGM/WAV decoders: encode->decode round-trips with
  * hand-computed statistics, tolerance for the format freedoms the
  * encoder never exercises (PGM comments/whitespace, foreign RIFF
  * chunks), and rejection of every malformation class a quarantine
  * path must catch.
  */
class CodecsSpec extends AnyFunSuite {

  test("PGM round-trip: stats match a hand-walked raster") {
    val b = encodePgm(4, 3, i => i * 20) // 0,20,...,220
    val s = decodePgm(b).get
    assert(s == ImageStats(4, 3, (0 until 12).map(_ * 20).sum, 0, 220,
      (0 until 12).map(i => i.toLong * i * 20).sum)) // wsum = 20*Σi² = 10120
  }

  test("PGM: pixel values are masked bytes, 255 survives") {
    val s = decodePgm(encodePgm(2, 2, _ => 255)).get
    assert(s == ImageStats(2, 2, 4L * 255, 255, 255, 255L * (0 + 1 + 2 + 3)))
  }

  test("PGM: comments and loose whitespace in the header parse") {
    val raster = Array.tabulate(6)(i => (i * 10).toByte)
    val header = "P5 # netpbm tools write these\n  # another\n 3\t2 # wxh\n255 "
      .getBytes("US-ASCII")
    val s = decodePgm(header ++ raster).get
    assert(s == ImageStats(3, 2, (0 until 6).map(_ * 10).sum, 0, 50,
      (0 until 6).map(i => i.toLong * i * 10).sum)) // wsum = 10*Σi² = 550
  }

  test("PGM: CRLF after maxval starts the raster after the LF") {
    // a Windows-side writer ends the header "255\r\n"; counting the
    // '\n' as pixel one would silently shift every statistic — the
    // decoder resolves the lone-'\r'-vs-CRLF ambiguity toward CRLF
    val raster = Array.tabulate(4)(i => (i * 3).toByte)
    val b = "P5\n2 2\n255\r\n".getBytes("US-ASCII") ++ raster
    assert(decodePgm(b).get ==
      ImageStats(2, 2, 0 + 3 + 6 + 9, 0, 9, 0 + 3 + 12 + 27))
    // a lone '\r' separator still counts as exactly one byte
    val lone = "P5\n2 2\n255\r".getBytes("US-ASCII") ++ raster
    assert(decodePgm(lone).get ==
      ImageStats(2, 2, 0 + 3 + 6 + 9, 0, 9, 0 + 3 + 12 + 27))
  }

  test("PGM rejections: magic, truncated raster, 16-bit maxval, zero dims") {
    assert(decodePgm("P6\n1 1\n255\nX".getBytes).isEmpty) // PPM magic
    assert(decodePgm(encodePgm(4, 4, _ => 1).dropRight(1)).isEmpty)
    assert(decodePgm("P5\n1 1\n65535\n\u0000\u0000".getBytes).isEmpty)
    assert(decodePgm("P5\n0 3\n255\n".getBytes).isEmpty)
    assert(decodePgm(Array[Byte]()).isEmpty)
  }

  test("WAV round-trip: abs-sum and raw extremes over planted samples") {
    val samples = Array(100, -200, 0, 32767, -32768)
    val b = encodeWav(8000, samples.length, samples(_))
    val s = decodeWav(b).get
    assert(s == AudioStats(8000, 5, 100L + 200 + 0 + 32767 + 32768,
      -32768, 32767, 1L * 200 + 3L * 32767 + 4L * 32768))
  }

  test("WAV: foreign chunks (LIST before fmt, odd-size with pad) skip") {
    val core = encodeWav(44100, 3, i => i * 1000)
    // splice a 5-byte "LIST" chunk (+1 pad byte) between WAVE and fmt
    val foreign = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = core.take(12) ++ foreign ++ core.drop(12)
    // RIFF size field is now stale; the parser must not rely on it
    val s = decodeWav(spliced).get
    assert(s == AudioStats(44100, 3, 3000L, 0, 2000, 0L + 1000 + 4000))
  }

  test("WAV rejections: magic, stereo, 8-bit, float, truncated data") {
    val ok = encodeWav(8000, 4, _ => 7)
    assert(decodeWav("RIFX".getBytes ++ ok.drop(4)).isEmpty)
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = ok.clone(); c(off) = (v & 0xff).toByte; c
    }
    assert(decodeWav(patched(22, 2)).isEmpty) // channels = 2
    assert(decodeWav(patched(34, 8)).isEmpty) // bits = 8
    assert(decodeWav(patched(20, 3)).isEmpty) // IEEE float format tag
    assert(decodeWav(ok.dropRight(1)).isEmpty) // data chunk truncated
    assert(decodeWav(Array[Byte]()).isEmpty)
  }

  test("WAV: zero-sample data chunk decodes to zeroed stats") {
    val s = decodeWav(encodeWav(16000, 0, _ => 0)).get
    assert(s == AudioStats(16000, 0, 0L, 0, 0, 0L))
  }

  // ---- BMP ----

  /** Gray BMP via equal channels: luma of (v,v,v) is exactly v
    * (299+587+114 = 1000), so hand statistics stay readable.
    */
  private def grayBmp(w: Int, h: Int, topDown: Boolean,
      v: Int => Int): Array[Byte] =
    encodeBmp(w, h, topDown, (i, _) => v(i))

  test("BMP round-trip: bottom-up and top-down storage decode identically") {
    // pixels (image order) 0,10,20,30,40,50 -> wsum = 10*Σi² = 550
    val want = ImageStats(3, 2, 150, 0, 50, 550)
    assert(decodeBmp(grayBmp(3, 2, topDown = false, _ * 10)).get == want)
    assert(decodeBmp(grayBmp(3, 2, topDown = true, _ * 10)).get == want)
  }

  test("BMP: orientation is load-bearing — a flipped height sign moves wsum") {
    val b = grayBmp(3, 2, topDown = false, _ * 10)
    // lie about the orientation: patch biHeight 2 -> -2 (the stored
    // bytes are bottom-up, the header now claims top-down)
    val lied = b.clone()
    lied(22) = (-2 & 0xff).toByte; lied(23) = 0xff.toByte
    lied(24) = 0xff.toByte; lied(25) = 0xff.toByte
    val s = decodeBmp(lied).get
    assert(s.sum == 150 && s.min == 0 && s.max == 50,
      "multiset stats must not see the row order")
    // rows swap: image becomes [30,40,50, 0,10,20] -> wsum = 280
    assert(s.wsum == 0L * 30 + 40 + 2 * 50 + 3 * 0 + 4 * 10 + 5 * 20,
      s"row-reversed wsum should be 280, got ${s.wsum}")
    assert(s.wsum != 550, "wsum failed to distinguish orientation")
  }

  test("BMP: channel order is BGR, not RGB") {
    // pure red 1x1: stored bytes must be (0, 0, 255); luma 76. A
    // decoder reading RGB order would report blue's 29 instead.
    val b = encodeBmp(1, 1, topDown = false,
      (_, c) => if (c == 0) 255 else 0)
    assert(b(54) == 0 && b(55) == 0 && b(56) == -1,
      "encoder must store BGR")
    assert(decodeBmp(b).get == ImageStats(1, 1, 76, 76, 76, 0))
  }

  test("BMP: row padding is skipped, whatever bytes it holds") {
    // width 2 -> 6 raster bytes + 2 pad per row
    val b = grayBmp(2, 2, topDown = false, _ * 10)
    assert(b.length == 54 + 2 * 8)
    val dirty = b.clone()
    dirty(54 + 6) = 0x7f; dirty(54 + 7) = 0x55 // bottom row's pad
    dirty(54 + 14) = 0x33.toByte; dirty(54 + 15) = 0x11 // top row's pad
    val want = ImageStats(2, 2, 60, 0, 30, 0 + 10 + 40 + 90)
    assert(decodeBmp(b).get == want)
    assert(decodeBmp(dirty).get == want, "pad bytes leaked into stats")
  }

  test("BMP: a data offset past 54 skips the gap; stale bfSize is ignored") {
    val b = grayBmp(2, 2, topDown = false, _ * 10)
    val want = decodeBmp(b).get
    // splice 4 junk bytes between headers and raster, point the
    // data offset at 58, and zero bfSize (writers leave it stale)
    val gapped = b.take(54) ++ Array[Byte](9, 9, 9, 9) ++ b.drop(54)
    gapped(10) = 58
    gapped(2) = 0; gapped(3) = 0; gapped(4) = 0; gapped(5) = 0
    assert(decodeBmp(gapped).contains(want))
  }

  test("BMP rejections: magic, depth, compression, dims, header, truncation") {
    val ok = grayBmp(3, 2, topDown = false, _ * 10)
    assert(decodeBmp(ok).isDefined)
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = ok.clone(); c(off) = (v & 0xff).toByte; c
    }
    assert(decodeBmp("XY".getBytes ++ ok.drop(2)).isEmpty) // magic
    assert(decodeBmp(patched(28, 8)).isEmpty) // 8-bit palette depth
    assert(decodeBmp(patched(28, 32)).isEmpty) // 32-bit BGRA
    assert(decodeBmp(patched(30, 1)).isEmpty) // BI_RLE8
    assert(decodeBmp(patched(26, 2)).isEmpty) // planes != 1
    assert(decodeBmp(patched(14, 124)).isEmpty) // BITMAPV5HEADER
    assert(decodeBmp(patched(18, 0)).isEmpty) // zero width
    assert(decodeBmp(patched(22, 0)).isEmpty) // zero height
    assert(decodeBmp(patched(10, 200)).isEmpty) // offset past payload
    assert(decodeBmp(ok.dropRight(1)).isEmpty) // truncated raster
    assert(decodeBmp(Array[Byte]()).isEmpty)
    assert(decodeBmp(ok.take(53)).isEmpty) // shorter than the headers
    // hostile biWidth = 2^30: an Int rowSize would wrap NEGATIVE,
    // sail through the raster bounds check, and crash the pixel walk
    // with AIOOBE — the decoder must return None, not throw
    val wide = ok.clone()
    wide(18) = 0; wide(19) = 0; wide(20) = 0; wide(21) = 0x40
    assert(decodeBmp(wide).isEmpty)
    // biHeight = Int.MinValue: math.abs is identity there
    val deep = ok.clone()
    deep(22) = 0; deep(23) = 0; deep(24) = 0; deep(25) = 0x80.toByte
    assert(decodeBmp(deep).isEmpty)
  }

  test("stats decoders reject rasters past the wsum overflow bound") {
    // MaxStatPixels bounds sum(i*value): past it the JVM Long would
    // silently wrap while DuckDB's BIGINT errors — the engines stop
    // being comparable, so the decode must refuse, not wrap
    assert(Codecs.MaxStatPixels == (1L << 27))
    // PGM header declaring 2^14 x 2^14 = 2^28 pixels (> 2^27); the
    // raster needn't exist — the header bound must reject first
    val pgm = "P5\n16384 16384\n255\n".getBytes("US-ASCII") ++
      Array.fill(64)(0.toByte)
    assert(decodePgm(pgm).isEmpty)
    // ... and exactly AT the bound the guard itself passes (the
    // truncated raster then rejects, proving the bound is what gated)
    val atBound = "P5\n16384 8192\n255\n".getBytes("US-ASCII") ++
      Array.fill(64)(0.toByte)
    assert(decodePgm(atBound).isEmpty) // truncated, but past the bound check
  }

  test("audio uses its own, tighter wsum bound (PCM16 reaches 32767, not 255)") {
    // At the IMAGE bound 2^27, the audio worst case 32767 * n^2 / 2
    // is ~2^68 — 32x over Long.MaxValue, silent JVM wraparound
    // against a DuckDB BIGINT that errors. 2^23 keeps ~8x margin.
    assert(Codecs.MaxStatSamples == (1L << 23))
    // A structurally valid mono PCM16 WAV whose data chunk declares
    // 2^23 + 1 samples (all-zero payload — the guard must fire before
    // the sample walk): must decode to None, not a wrapped wsum.
    val n = (1 << 23) + 1
    val over = Codecs.encodeWav(16000, n, _ => 0)
    assert(decodeWav(over).isEmpty)
    // One sample fewer sits AT the bound and decodes fine.
    val at = Codecs.encodeWav(16000, n - 1, _ => 0)
    val st = decodeWav(at).get
    assert(st.nSamples == n - 1 && st.sumAbs == 0L && st.wsum == 0L)
  }

  // ---- PNG ----

  /** Patch one IHDR byte and re-seal the chunk CRC, so structural
    * rejections are tested independently of CRC rejections. Layout of
    * our canonical output: magic 0-7, IHDR len 8-11, type 12-15, data
    * 16-28 (w 16-19, h 20-23, depth 24, color 25, interlace 28), CRC
    * 29-32.
    */
  private def patchIhdr(png: Array[Byte], off: Int, v: Int): Array[Byte] = {
    val c = png.clone()
    c(off) = v.toByte
    val crc = new java.util.zip.CRC32()
    crc.update(c, 12, 17)
    (0 until 4).foreach(i =>
      c(29 + i) = ((crc.getValue >> (8 * (3 - i))) & 0xff).toByte)
    c
  }

  /** A raw chunk for hand-assembled containers. */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p32(v: Long): Unit =
      (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    p32(data.length.toLong)
    out.write(typ.getBytes("US-ASCII"), 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    p32(crc.getValue)
    out.toByteArray
  }

  /** Split a canonical single-IDAT PNG into (preamble=magic+IHDR,
    * idatData, trailer=IEND).
    */
  private def explode(png: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte]) = {
    val idatLen = ((png(33) & 0xff) << 24) | ((png(34) & 0xff) << 16) |
      ((png(35) & 0xff) << 8) | (png(36) & 0xff)
    (png.take(33), png.slice(41, 41 + idatLen), png.drop(41 + idatLen + 4))
  }

  test("PNG round-trip: all five filters reconstruct (gray, 5 rows)") {
    val px = Array.tabulate(4 * 5)(i => (i * 13) % 256)
    val b = encodePng(4, 5, 0, (i, _) => px(i), y => y % 5)
    assert(decodePng(b).get ==
      ImageStats(4, 5, px.map(_.toLong).sum, px.min, px.max,
        px.zipWithIndex.map { case (v, i) => i.toLong * v }.sum))
  }

  test("PNG: hand-computed Sub+Paeth filtered bytes decode to known pixels") {
    // pixels row0 [10,20,30] (filter 1/Sub), row1 [40,60,90] (filter
    // 4/Paeth) — filtered bytes derived by hand from the spec's
    // predictor definitions, so a mirrored encode/decode bug can't
    // cancel out here
    val raw = Array[Byte](1, 10, 10, 10, 4, 30, 20, 30)
    val s = decodePng(buildPng(3, 2, 0, raw)).get
    assert(s == ImageStats(3, 2, 10L + 20 + 30 + 40 + 60 + 90, 10, 90,
      0L + 20 + 60 + 120 + 240 + 450))
  }

  test("PNG: hand-computed Average+Up filtered bytes decode to known pixels") {
    // pixels row0 [100,101] (filter 3/Average: 100-0, 101-(100+0)/2),
    // row1 [50,200] (filter 2/Up: 50-100 -> 206, 200-101 -> 99)
    val raw = Array[Byte](3, 100, 51, 2, 206.toByte, 99)
    val s = decodePng(buildPng(2, 2, 0, raw)).get
    assert(s == ImageStats(2, 2, 100L + 101 + 50 + 200, 50, 200,
      0L + 101 + 100 + 600))
  }

  test("PNG: RGB reduces through integer luma") {
    // pure red / green / blue pixels: 299, 587, 114 per mille
    val px = Array(Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255))
    val b = encodePng(3, 1, 2, (i, c) => px(i)(c))
    assert(decodePng(b).get == ImageStats(3, 1, 76L + 149 + 29, 29, 149, 0L + 149 + 58))
  }

  test("PNG: RGBA carries alpha in the stream but not the stats") {
    val b = encodePng(1, 1, 6,
      (_, c) => Array(10, 20, 30, 255)(c))
    assert(decodePng(b).get ==
      ImageStats(1, 1, (10 * 299 + 20 * 587 + 30 * 114) / 1000L, 18, 18, 0L))
  }

  test("PNG: consecutive multi-IDAT decodes; interleaved IDAT rejects") {
    val whole = encodePng(4, 3, 0, (i, _) => i * 7)
    val want = decodePng(whole).get
    val (pre, z, end) = explode(whole)
    val (z1, z2) = z.splitAt(z.length / 2)
    val multi = pre ++ chunk("IDAT", z1) ++ chunk("IDAT", z2) ++ end
    assert(decodePng(multi).contains(want))
    val interleaved = pre ++ chunk("IDAT", z1) ++
      chunk("tEXt", "k\u0000v".getBytes("US-ASCII")) ++
      chunk("IDAT", z2) ++ end
    assert(decodePng(interleaved).isEmpty)
    // an ancillary chunk BEFORE the (whole) IDAT is fine
    val ancillary = pre ++
      chunk("tEXt", "k\u0000v".getBytes("US-ASCII")) ++
      chunk("IDAT", z) ++ end
    assert(decodePng(ancillary).contains(want))
  }

  test("PNG rejections: magic, CRC, dims vs stream, interlace, filter, trailer") {
    val ok = encodePng(2, 2, 0, (i, _) => i * 50)
    assert(decodePng(ok).isDefined)
    assert(decodePng("notapng".getBytes).isEmpty)
    assert(decodePng(Array[Byte]()).isEmpty)
    // flip one IDAT data byte without re-sealing the CRC
    val corrupt = ok.clone(); corrupt(42) = (corrupt(42) ^ 0x5a).toByte
    assert(decodePng(corrupt).isEmpty)
    // IHDR says more pixels than the stream holds (width 2 -> 3)
    assert(decodePng(patchIhdr(ok, 19, 3)).isEmpty)
    // ... and fewer (surplus decompressed bytes; width 2 -> 1)
    assert(decodePng(patchIhdr(ok, 19, 1)).isEmpty)
    assert(decodePng(patchIhdr(ok, 28, 1)).isEmpty) // Adam7 interlace
    assert(decodePng(patchIhdr(ok, 24, 16)).isEmpty) // 16-bit depth
    assert(decodePng(patchIhdr(ok, 25, 3)).isEmpty) // palette color type
    assert(decodePng(ok ++ Array[Byte](0)).isEmpty) // trailing garbage
    assert(decodePng(ok.dropRight(1)).isEmpty) // truncated container
    // filter byte out of range, sealed through the real chunk path
    val raw = Array[Byte](5, 1, 2, 0, 3, 4)
    assert(decodePng(buildPng(2, 2, 0, raw)).isEmpty)
  }
}
