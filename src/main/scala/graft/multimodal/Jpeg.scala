package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageReader, ImageWriteParam}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import graft.multimodal.Codecs.ImageStats

/** Entropy-coded media decode — JPEG via the JDK's bundled ImageIO
  * reader (`java.desktop` ships libjpeg behind
  * `javax.imageio.ImageIO`), the same zero-dependency posture as the
  * hand-written PNG/zlib path in [[Codecs]]. This closes the last
  * `fmt='gm'` capability stub: Huffman decode, dequantization, and
  * the IDCT are the JDK's real codec, not a stand-in.
  *
  * ORACLE STRATEGY — why the planted corpus is per-8x8-block-constant
  * grayscale at quality 1.0: JPEG is lossy in general, so a DuckDB
  * oracle can only recompute decoded statistics closed-form if
  * decode(encode(raster)) == raster EXACTLY. Block-constant gray
  * rasters guarantee that: within each 8x8 block every forward-DCT
  * butterfly subtracts equal values, so all 63 AC coefficients are
  * EXACTLY zero in any implementation (integer or float), the DC
  * coefficient is exactly 8·(v-128), quality 1.0 makes every
  * quantizer entry 1 (the IJG scaling at quality 100), and the
  * DC-only inverse transform reproduces the constant exactly.
  * JpegSpec proves the round-trip for ALL 256 gray levels and for
  * multi-block images, so the closed-form q138 oracle rests on a
  * spec-pinned invariant, not on luck. Arbitrary real-world JPEGs
  * decode fine too — their stats just aren't oracle-checkable, which
  * is inherent to a lossy format, not a gap in the decoder.
  *
  * Reference posture: the reference (ngafid_cpat) has no media path
  * at all; this is part of the §2.11 multimodal extension
  * (SURVEY.md), sibling to q129/q130/q133.
  */
object Jpeg {

  // ImageIO defaults to spooling streams through temp FILES; these
  // payloads are small in-memory arrays — a disk round-trip per
  // decode would dominate the codec. Memory-cached streams are used
  // explicitly below; this kills the global default too for safety.
  ImageIO.setUseCache(false)

  /** JPEG/JFIF magic: every JPEG stream starts FF D8 FF. */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte &&
      b(2) == 0xff.toByte

  /** One reusable JPEG reader — THE per-batch handle.
    * `ImageIO.read` would scan the service registry and allocate a
    * fresh native decoder per payload; a batch worker opens one
    * reader and re-points its input per item (the amortization seam
    * [[BatchedDecode]] exists for). Call [[close]] when the batch is
    * done.
    */
  final class Handle {
    private var readerOrNull: ImageReader = null
    private[Jpeg] def reader(): ImageReader = {
      if (readerOrNull == null)
        readerOrNull = ImageIO.getImageReadersByFormatName("jpeg").next()
      readerOrNull
    }
    def close(): Unit = {
      if (readerOrNull != null) { readerOrNull.dispose(); readerOrNull = null }
    }
  }

  /** Decode a JPEG payload to gray statistics through a reusable
    * [[Handle]]; None on any malformation (not a JPEG, truncated
    * entropy stream, unsupported layout) or on rasters past the
    * [[Codecs.MaxStatPixels]] wsum-overflow bound — checked from the
    * HEADER dimensions before any pixel is decoded, so an oversized
    * payload costs a header parse, not a full decode.
    *
    * Gray reduction matches the rest of the family: single-band
    * images read their samples directly; color images reduce through
    * [[Codecs.pngLuma]] (band 0/1/2 = R/G/B in Raster sample space).
    * Pixel order is row-major top-down — the order the `wsum`
    * statistic is defined over.
    */
  def decodeWith(h: Handle, b: Array[Byte]): Option[ImageStats] = {
    if (!sniff(b)) return None
    try {
      val r = h.reader()
      val in = new MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        r.setInput(in, true, true)
        val w = r.getWidth(0)
        val ht = r.getHeight(0)
        if (w <= 0 || ht <= 0 || w.toLong * ht > Codecs.MaxStatPixels)
          return None
        val img = r.read(0)
        stats(img)
      } finally {
        // detach before closing: a reader holding a closed stream
        // poisons the NEXT item's setInput on some JDK codecs
        r.setInput(null)
        in.close()
      }
    } catch {
      // ImageIO signals malformation with IIOException/IOException;
      // hostile headers can also surface as runtime errors inside the
      // native decoder wrapper — a stats probe must drop, not throw
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }
  }

  /** One-shot decode (spec/tool convenience): open a [[Handle]],
    * decode, close.
    */
  def decode(b: Array[Byte]): Option[ImageStats] = {
    val h = new Handle
    try decodeWith(h, b) finally h.close()
  }

  /** dHash of a JPEG payload through a reusable [[Handle]] — the
    * second real decoder wired into [[Phash]] (PGM is the first), so
    * the perceptual near-dup path is format-plural like the stats
    * family. Same gray reduction and rejection rules as
    * [[decodeWith]].
    */
  def dhashWith(h: Handle, b: Array[Byte]): Option[Array[Int]] = {
    if (!sniff(b)) return None
    try {
      val r = h.reader()
      val in = new MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        r.setInput(in, true, true)
        val w = r.getWidth(0)
        val ht = r.getHeight(0)
        if (w <= 0 || ht <= 0 || w.toLong * ht > Codecs.MaxStatPixels)
          return None
        val img = r.read(0)
        val raster = img.getRaster
        val bands = raster.getNumBands
        if (bands != 1 && bands != 3) return None
        val gray: Int => Int =
          if (bands == 1) i => raster.getSample(i % w, i / w, 0)
          else i => Codecs.pngLuma(
            raster.getSample(i % w, i / w, 0),
            raster.getSample(i % w, i / w, 1),
            raster.getSample(i % w, i / w, 2))
        Phash.dhashLimbs(w, ht, gray)
      } finally {
        r.setInput(null)
        in.close()
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }
  }

  private def stats(img: BufferedImage): Option[ImageStats] = {
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    // 1 band = grayscale, 3 = RGB. Anything else — a 4-band
    // CMYK/YCCK JPEG ImageIO happens to decode — must be REJECTED
    // like other unsupported layouts: reducing bands 0/1/2 through
    // pngLuma would silently emit luma over C/M/Y.
    val bands = raster.getNumBands
    if (bands != 1 && bands != 3) return None
    val gray = bands == 1
    var sum = 0L; var wsum = 0L
    var min = Int.MaxValue; var max = Int.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (gray) raster.getSample(x, y, 0)
          else Codecs.pngLuma(raster.getSample(x, y, 0),
            raster.getSample(x, y, 1), raster.getSample(x, y, 2))
        sum += v
        wsum += (y.toLong * w + x) * v
        if (v < min) min = v
        if (v > max) max = v
        x += 1
      }
      y += 1
    }
    Some(ImageStats(w, h, sum, min, max, wsum))
  }

  /** Encode a grayscale JPEG at quality 1.0 whose 8x8 blocks are each
    * CONSTANT: `blockValue(bi)` supplies the gray level of block
    * index `bi = (y/8)·(w/8) + (x/8)` (row-major over blocks), masked
    * to a byte. `w` and `h` must be multiples of 8 — no partial
    * blocks, so the exact-round-trip invariant documented on the
    * object holds with no edge-replication caveats.
    */
  def encodeBlockGray(w: Int, h: Int, blockValue: Int => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && w > 0 && h > 0,
      s"block-constant JPEG needs whole 8x8 blocks, got ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val blocksPerRow = w / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          blockValue((y / 8) * blocksPerRow + x / 8) & 0xff)
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f) // quality 100: all-ones quant tables
      val bos = new ByteArrayOutputStream()
      val out = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(out)
      writer.write(null, new IIOImage(img, null, null), p)
      out.close()
      bos.toByteArray
    } finally writer.dispose()
  }
}
