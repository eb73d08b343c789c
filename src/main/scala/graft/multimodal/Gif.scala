package graft.multimodal

import java.io.ByteArrayOutputStream
import javax.imageio.{ImageIO, ImageReader}
import javax.imageio.stream.MemoryCacheImageInputStream

import graft.multimodal.Codecs.ImageStats

/** GIF decode via the JDK's bundled ImageIO reader — the palette
  * (LZW-compressed, indexed-color) member of the real-decoder family
  * beside [[Jpeg]] (DCT) and [[Codecs.decodePng]] (zlib). The two
  * ends are INDEPENDENT implementations: [[encodeGray]] is a
  * hand-written GIF89a byte layout with its own LZW bitstream (the
  * classic "uncompressed GIF" scheme — literal root codes with a
  * CLEAR before the code width would ever grow, so every code is
  * exactly 9 bits), decoding is the JDK's real LZW codec — a bug on
  * either side breaks the closed-form oracle instead of cancelling
  * out.
  *
  * GIF is LOSSLESS, so unlike JPEG no raster restriction is needed
  * for oracle-exactness: any planted raster round-trips bit-exactly
  * and the DuckDB oracle recomputes its statistics from doc_id alone.
  *
  * Gray reduction is PALETTE-AWARE: the decoded raster carries
  * palette indices, which are meaningless without the color table, so
  * stats map each index through the IndexColorModel and reduce RGB
  * via [[Codecs.pngLuma]] (for [[encodeGray]]'s grayscale palette,
  * pngLuma(i,i,i) == i exactly — weights sum to 1000).
  *
  * Reference posture: the reference (ngafid_cpat) has no media path;
  * §2.11 multimodal extension (SURVEY.md), sibling of q130/q133/q138.
  */
object Gif {

  /** GIF magic: "GIF8" (87a and 89a both decode). */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8'

  /** One reusable GIF reader — THE per-batch handle (same seam as
    * [[Jpeg.Handle]]: `ImageIO.read` would re-scan the provider
    * registry per payload).
    */
  final class Handle {
    private var readerOrNull: ImageReader = null
    private[Gif] def reader(): ImageReader = {
      if (readerOrNull == null)
        readerOrNull = ImageIO.getImageReadersByFormatName("gif").next()
      readerOrNull
    }
    def close(): Unit = {
      if (readerOrNull != null) { readerOrNull.dispose(); readerOrNull = null }
    }
  }

  /** Decode a GIF payload (first frame) to gray statistics through a
    * reusable [[Handle]]; None on malformation, non-indexed layouts,
    * or rasters past the [[Codecs.MaxStatPixels]] bound (checked from
    * the header before pixel decode). Pixel order is row-major
    * top-down — the order `wsum` is defined over.
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
        val raster = img.getRaster
        if (raster.getNumBands != 1) return None
        val icm = img.getColorModel match {
          case m: java.awt.image.IndexColorModel => m
          case _ => return None
        }
        var sum = 0L; var wsum = 0L
        var min = Int.MaxValue; var max = Int.MinValue
        var y = 0
        while (y < ht) {
          var x = 0
          while (x < w) {
            val idx = raster.getSample(x, y, 0)
            val v = Codecs.pngLuma(
              icm.getRed(idx), icm.getGreen(idx), icm.getBlue(idx))
            sum += v
            wsum += (y.toLong * w + x) * v
            if (v < min) min = v
            if (v > max) max = v
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, ht, sum, min, max, wsum))
      } finally {
        r.setInput(null)
        in.close()
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }
  }

  /** One-shot decode (spec/tool convenience). */
  def decode(b: Array[Byte]): Option[ImageStats] = {
    val h = new Handle
    try decodeWith(h, b) finally h.close()
  }

  /** Hand-written GIF89a encoder: grayscale 256-entry global palette
    * (entry i = (i,i,i)), one image, LZW min code size 8 with the
    * uncompressed-GIF bitstream — after a CLEAR, at most 128 literal
    * root codes are emitted before the next CLEAR, so the decoder's
    * dictionary never reaches 512 and every code stays 9 bits. LSB-
    * first bit packing, data split into ≤255-byte sub-blocks.
    * `pixel(i)` supplies row-major gray levels, masked to a byte.
    */
  def encodeGray(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad GIF dims ${width}x$height")
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    // header + logical screen descriptor
    "GIF89a".foreach(c => out.write(c.toInt))
    u16(width); u16(height)
    out.write(0xf7) // global table, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor
    out.write(0x2c); u16(0); u16(0); u16(width); u16(height); out.write(0)
    // LZW stream: 9-bit codes, CLEAR = 256, EOI = 257
    out.write(8) // min code size
    val codes = new ByteArrayOutputStream() // packed bits
    var acc = 0L
    var nBits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += 9
      while (nBits >= 8) {
        codes.write((acc & 0xff).toInt)
        acc >>= 8
        nBits -= 8
      }
    }
    emit(256) // initial CLEAR
    var run = 0
    var p = 0
    val n = width * height
    while (p < n) {
      if (run == 128) { emit(256); run = 0 } // re-CLEAR: stay 9-bit
      emit(pixel(p) & 0xff)
      run += 1
      p += 1
    }
    emit(257) // EOI
    if (nBits > 0) codes.write((acc & 0xff).toInt) // flush partial byte
    // sub-blocks
    val packed = codes.toByteArray
    var off = 0
    while (off < packed.length) {
      val len = math.min(255, packed.length - off)
      out.write(len)
      out.write(packed, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
