package graft.multimodal

/** Pure-JVM media decoders for the dependency-free formats the
  * container CAN decode for real — header + raster/sample math (plus
  * the JDK's built-in zlib for PNG), no codec library:
  *
  *  - PGM ("P5" binary, 8-bit): the netpbm grayscale raster. Header
  *    is ASCII tokens (magic, width, height, maxval) separated by
  *    whitespace with `#`-to-EOL comments, then exactly width*height
  *    gray bytes.
  *  - WAV (RIFF "WAVE", PCM signed 16-bit little-endian, mono):
  *    chunked container; the "fmt " chunk declares PCM16/mono, the
  *    "data" chunk carries the samples. Unknown chunks are skipped
  *    (word-aligned, per RIFF).
  *  - PNG (8-bit gray / RGB / RGBA, non-interlaced): a REAL
  *    compressed format — chunk walk with CRC-32 verification, IDAT
  *    concatenation, zlib inflate (`java.util.zip.Inflater`, in the
  *    JDK — no dependency), and per-scanline filter reconstruction
  *    (None/Sub/Up/Average/Paeth per the PNG spec).
  *
  * These close the honest capability gap the earlier rounds
  * documented at the `===STUB===` seam (MultimodalOps.scala /
  * BatchedDecode.scala): pixel/sample decode used to be faked for
  * EVERY format because the sandbox ships no codec libraries; for
  * these formats it is now real. JPEG is also real — via the JDK's
  * bundled ImageIO reader, see [[Jpeg]] — so the deterministic
  * fallback remains only for formats with NO in-JDK decoder at all
  * (MP3, H.264 ...); the seam and batching are unchanged, a JNI
  * decoder drops in the same way these did.
  *
  * Decoders return reduced STATISTICS, not rasters: at 100 TB the
  * decode worker must emit compact typed rows, never re-materialized
  * pixel arrays (the payload column already holds the bytes; anything
  * downstream of decode that needs full rasters reads them inside the
  * same worker).
  */
object Codecs {

  /** Decoded image summary: `sum`/`min`/`max` over the gray raster,
    * plus `wsum` = Σ i * gray(i) over ROW-MAJOR TOP-DOWN pixel index —
    * the order-SENSITIVE statistic. sum/min/max are multiset
    * reductions: a decoder that permutes pixels (bottom-up rows read
    * top-down, a mis-reconstructed PNG filter that swaps values, a
    * stride bug) can pass them; wsum hash-fails the gate instead.
    */
  final case class ImageStats(width: Int, height: Int, sum: Long,
      min: Int, max: Int, wsum: Long)

  /** Decoded audio summary: `sumAbs` over samples, raw min/max, and
    * the order-sensitive `wsum` = Σ i * |sample(i)|.
    */
  final case class AudioStats(sampleRate: Int, nSamples: Int,
      sumAbs: Long, min: Int, max: Int, wsum: Long)

  // ---- PGM (P5) ----

  /** Parse a binary PGM payload; None on any malformation (bad magic,
    * truncated raster, maxval > 255 — 16-bit PGM is out of scope).
    */
  /** Parse the PGM header: (width, height, raster byte offset), or
    * None on malformation. Shared by the stats decode and the dHash
    * path so the header grammar (comments, CRLF separator resolution,
    * maxval bound) lives in exactly one place.
    */
  private[multimodal] def pgmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '5') return None
    var pos = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    // whitespace + '#' comments between header tokens
    def skipWs(): Boolean = {
      var progressed = true
      while (progressed && pos < b.length) {
        progressed = false
        while (pos < b.length && isWs(b(pos))) { pos += 1; progressed = true }
        if (pos < b.length && b(pos) == '#') {
          while (pos < b.length && b(pos) != '\n') pos += 1
          progressed = true
        }
      }
      pos < b.length
    }
    def token(): Option[Int] = {
      if (!skipWs()) return None
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- token()
      h <- token()
      maxval <- token()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      if w.toLong * h <= MaxStatPixels // wsum overflow bound
      // ONE whitespace byte separates maxval from the raster — but a
      // CRLF writer emits "\r\n", and counting the '\n' as pixel one
      // would silently shift every statistic. Resolve the ambiguity
      // toward CRLF (a lone-'\r' separator followed by a true 0x0A
      // first pixel is vanishingly rare next to Windows-side
      // writers); all other separators remain strictly one byte.
      if pos < b.length && isWs(b(pos))
      raster = if (b(pos) == '\r' && pos + 1 < b.length &&
        b(pos + 1) == '\n') pos + 2 else pos + 1
      if b.length - raster >= w.toLong * h
    } yield (w, h, raster)
  }

  def decodePgm(b: Array[Byte]): Option[ImageStats] =
    pgmHeader(b).map { case (w, h, raster) =>
      var sum = 0L
      var wsum = 0L
      var min = 255
      var max = 0
      var i = raster
      val end = raster + w * h
      while (i < end) {
        val px = b(i) & 0xff
        sum += px
        wsum += (i - raster).toLong * px // storage order IS image order
        if (px < min) min = px
        if (px > max) max = px
        i += 1
      }
      ImageStats(w, h, sum, min, max, wsum)
    }

  /** Write a canonical binary PGM (maxval 255); `pixel(i)` supplies
    * the raster in row-major order, masked to a byte.
    */
  def encodePgm(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      out(header.length + i) = (pixel(i) & 0xff).toByte
      i += 1
    }
    out
  }

  // ---- WAV (RIFF / PCM16LE mono) ----

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def s16le(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt

  /** Parse a RIFF/WAVE payload; None unless it declares PCM (format
    * tag 1), mono, 16-bit — and carries a data chunk. Chunks other
    * than fmt/data are skipped with RIFF word alignment.
    */
  /** RIFF chunk walk shared by [[decodeWav]] (fused stats) and
    * [[decodeWavSamples]] (raw samples for DSP consumers): returns
    * (sampleRate, dataOff, nSamples) for a PCM16LE mono WAVE, None on
    * any malformation or past the [[MaxStatSamples]] bound.
    */
  private def wavLayout(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length &&
        (0 until 4).forall(i => b(off + i) == s.charAt(i).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate = -1
    var ok = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (dataOff < 0 || rate < 0)) {
      val size = u32le(b, pos + 4)
      if (size < 0 || size > Int.MaxValue ||
        pos + 8 + size > b.length) return None
      val body = pos + 8
      if (tag(pos, "fmt ")) {
        if (size < 16) return None
        ok = u16le(b, body) == 1 && u16le(b, body + 2) == 1 &&
          u16le(b, body + 14) == 16
        rate = u32le(b, body + 4).toInt
      } else if (tag(pos, "data")) {
        dataOff = body
        dataLen = size.toInt
      }
      pos = body + size.toInt + (size.toInt & 1) // word-aligned
    }
    if (!ok || rate <= 0 || dataOff < 0 || dataLen % 2 != 0) return None
    val n = dataLen / 2
    if (n > MaxStatSamples) return None // PCM16 wsum overflow bound
    Some((rate, dataOff, n))
  }

  /** Raw PCM16 samples of a mono WAV — the input seam for DSP
    * operators ([[Acf]] autocorrelation pitch, q146) that need the
    * waveform, not just [[AudioStats]].
    */
  def decodeWavSamples(b: Array[Byte]): Option[(Int, Array[Int])] =
    wavLayout(b).map { case (rate, dataOff, n) =>
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = s16le(b, dataOff + i * 2); i += 1 }
      (rate, out)
    }

  def decodeWav(b: Array[Byte]): Option[AudioStats] = {
    val layout = wavLayout(b)
    if (layout.isEmpty) return None
    val (rate, dataOff, n) = layout.get
    var sumAbs = 0L
    var wsum = 0L
    var min = Int.MaxValue
    var max = Int.MinValue
    var i = 0
    while (i < n) {
      val s = s16le(b, dataOff + i * 2)
      sumAbs += math.abs(s)
      wsum += i.toLong * math.abs(s)
      if (s < min) min = s
      if (s > max) max = s
      i += 1
    }
    if (n == 0) { min = 0; max = 0 }
    Some(AudioStats(rate, n, sumAbs, min, max, wsum))
  }

  /** Write a canonical PCM16LE mono WAV; `sample(i)` supplies the
    * samples (clamped to short range by the cast).
    */
  def encodeWav(sampleRate: Int, nSamples: Int,
      sample: Int => Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def put(off: Int, s: String): Unit =
      (0 until s.length).foreach(i => out(off + i) = s.charAt(i).toByte)
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => out(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    put(0, "RIFF"); p32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L)
    p16(20, 1); p16(22, 1) // PCM, mono
    p32(24, sampleRate.toLong); p32(28, sampleRate.toLong * 2)
    p16(32, 2); p16(34, 16) // block align, bits
    put(36, "data"); p32(40, dataLen.toLong)
    var i = 0
    while (i < nSamples) {
      p16(44 + i * 2, sample(i).toShort & 0xffff)
      i += 1
    }
    out
  }

  // ---- BMP (Windows DIB, 24-bit BI_RGB) ----

  private def s32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Parse a BMP payload; None unless it is a 24-bit uncompressed
    * (BI_RGB) BITMAPINFOHEADER bitmap. The format's three quirks are
    * exactly what this decoder must get right and what the
    * order-sensitive wsum catches if it doesn't:
    *
    *  - channel order is BGR, not RGB;
    *  - rows are stored BOTTOM-UP when biHeight > 0 (a negative
    *    biHeight flags top-down storage — both orientations decode
    *    to the same top-down image);
    *  - every stored row pads to a 4-byte boundary.
    *
    * `bfSize` is NOT validated against the payload length (real
    * writers leave it stale/zero — the RIFF-size posture of
    * [[decodeWav]]); the pixel-data offset and the raster extent are.
    * A data offset past 54 (color-space gunk between the headers and
    * the raster) is skipped. Color reduces through [[pngLuma]].
    */
  def decodeBmp(b: Array[Byte]): Option[ImageStats] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = u32le(b, 10)
    val hdrSize = u32le(b, 14)
    if (hdrSize != 40) return None // V4/V5/core headers out of scope
    val w = s32le(b, 18)
    val hRaw = s32le(b, 22)
    val planes = u16le(b, 26)
    val bpp = u16le(b, 28)
    val compression = u32le(b, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || planes != 1 ||
      bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    if (w.toLong * h > MaxStatPixels) return None // wsum overflow bound
    // Long arithmetic: a hostile biWidth near 2^30 overflows an Int
    // rowSize to NEGATIVE, which would sail through the raster bounds
    // check below and crash the pixel walk instead of returning None
    val rowSizeL = (w.toLong * 3 + 3) & ~3L
    if (dataOff < 54 || dataOff + rowSizeL * h > b.length) return None
    val rowSize = rowSizeL.toInt // <= b.length after the check
    var sum = 0L
    var wsum = 0L
    var min = 255
    var max = 0
    var y = 0
    while (y < h) {
      val storageRow = if (topDown) y else h - 1 - y
      val off = dataOff.toInt + storageRow * rowSize
      var px = 0
      while (px < w) {
        val i = off + px * 3
        val gray = pngLuma(b(i + 2) & 0xff, b(i + 1) & 0xff, b(i) & 0xff)
        sum += gray
        wsum += (y.toLong * w + px) * gray
        if (gray < min) min = gray
        if (gray > max) max = gray
        px += 1
      }
      y += 1
    }
    Some(ImageStats(w, h, sum, min, max, wsum))
  }

  /** Write a canonical 24-bit BI_RGB BMP; `sample(i, c)` supplies
    * channel `c` (0=r, 1=g, 2=b) of IMAGE row-major (top-down) pixel
    * `i`. `topDown` picks the storage orientation: false writes the
    * conventional bottom-up raster (positive biHeight), true writes
    * top-down with a negative biHeight — the decoded image is
    * identical either way, which is precisely what the planted q133
    * corpus exercises by alternating orientations.
    */
  def encodeBmp(width: Int, height: Int, topDown: Boolean,
      sample: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) & ~3
    val dataLen = rowSize * height
    val out = new Array[Byte](54 + dataLen)
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => out(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54L + dataLen) // bfSize
    p32(10, 54L) // data offset
    p32(14, 40L) // BITMAPINFOHEADER
    p32(18, width.toLong)
    p32(22, (if (topDown) -height else height).toLong)
    p16(26, 1) // planes
    p16(28, 24) // bits per pixel
    p32(30, 0L) // BI_RGB
    p32(34, dataLen.toLong)
    p32(38, 2835L); p32(42, 2835L) // 72 DPI
    var y = 0
    while (y < height) {
      val storageRow = if (topDown) y else height - 1 - y
      val off = 54 + storageRow * rowSize
      var px = 0
      while (px < width) {
        val i = y * width + px
        out(off + px * 3) = (sample(i, 2) & 0xff).toByte // blue first
        out(off + px * 3 + 1) = (sample(i, 1) & 0xff).toByte
        out(off + px * 3 + 2) = (sample(i, 0) & 0xff).toByte
        px += 1
      }
      // pad bytes default to 0 in the array
      y += 1
    }
    out
  }

  // ---- PNG (8-bit gray / RGB / RGBA, non-interlaced) ----

  /** Upper bound on pixels an image stats decode accepts: the
    * order-sensitive wsum is Σ i·value(i), whose image worst case
    * 255 · n²/2 must stay inside a signed Long — and the DuckDB
    * oracle's BIGINT, which ERRORS on overflow where the JVM would
    * silently wrap, so past this bound the two engines stop being
    * comparable. At 2^27 pixels (an 11.5k × 11.5k image) the worst
    * case is 255 · 2^53 ≈ 2^61, a ~4x margin under Long.MaxValue;
    * anything larger belongs in a streaming decode, not a per-row
    * stats probe.
    */
  val MaxStatPixels: Long = 1L << 27

  /** Audio gets a tighter bound than images because PCM16 amplitudes
    * reach 32767, not 255: at 2^23 samples (an 8.7-minute 16 kHz mono
    * clip) the wsum worst case 32767 · (2^23)²/2 ≈ 2^60 keeps an ~8x
    * margin under Long.MaxValue, whereas the image bound 2^27 would
    * put audio at ~2^68 — silent JVM wraparound against a DuckDB
    * BIGINT that errors, the exact divergence this bound prevents.
    */
  val MaxStatSamples: Long = 1L << 23

  /** The 8-byte PNG signature. */
  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Samples per pixel for the supported color types (0 gray, 2 RGB,
    * 6 RGBA); -1 for anything else (palette and gray+alpha are out of
    * scope — the planted corpus never uses them).
    */
  private def pngBpp(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case _ => -1
  }

  /** Integer luma for color pixels: (299 r + 587 g + 114 b) / 1000,
    * truncating — the deterministic gray reduction the oracle
    * recomputes closed-form. Alpha is ignored.
    */
  def pngLuma(r: Int, g: Int, bl: Int): Int =
    (r * 299 + g * 587 + bl * 114) / 1000

  /** Parse a PNG payload; None on any malformation. Strict by design
    * (planted corpora are canonical): every chunk's CRC-32 must
    * verify, IHDR must declare 8-bit gray/RGB/RGBA non-interlaced,
    * IDAT chunks must be consecutive, the zlib stream must inflate to
    * EXACTLY height scanlines (no truncation, no surplus), every
    * scanline's filter byte must be 0-4, and IEND must be the last
    * byte of the payload.
    *
    * Statistics reduce the GRAY raster: color pixels go through
    * [[pngLuma]]; alpha never contributes. Filter reconstruction
    * follows the spec: Sub/Up/Average/Paeth predict from the left /
    * up / up-left RECONSTRUCTED neighbors with out-of-frame neighbors
    * read as zero, and Paeth picks the neighbor minimizing the
    * distance to `a + b - c` with the left-first tie order.
    */
  def decodePng(b: Array[Byte]): Option[ImageStats] = {
    if (b.length < 8 || !(0 until 8).forall(i => b(i) == PngMagic(i)))
      return None
    var pos = 8
    var w = -1; var h = -1; var colorType = -1
    var sawIhdr = false; var idatClosed = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (pos + 12 > b.length) return None
      val len = u32be(b, pos)
      if (len > Int.MaxValue || pos + 12 + len > b.length) return None
      val n = len.toInt
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + n)
      if (crc.getValue != u32be(b, pos + 8 + n)) return None
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ != "IDAT" && idat.size() > 0) idatClosed = true
      typ match {
        case "IHDR" =>
          if (sawIhdr || n != 13) return None
          sawIhdr = true
          w = u32be(b, pos + 8).toInt
          h = u32be(b, pos + 12).toInt
          colorType = b(pos + 17) & 0xff
          val bitDepth = b(pos + 16) & 0xff
          val compression = b(pos + 18) & 0xff
          val filterMethod = b(pos + 19) & 0xff
          val interlace = b(pos + 20) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 || pngBpp(colorType) < 0 ||
            compression != 0 || filterMethod != 0 || interlace != 0)
            return None
        case "IDAT" =>
          if (!sawIhdr || idatClosed) return None
          idat.write(b, pos + 8, n)
        case "IEND" =>
          if (!sawIhdr || n != 0) return None
          sawIend = true
        case _ =>
          if (!sawIhdr) return None // ancillary chunks skipped otherwise
      }
      pos += 12 + n
    }
    if (pos != b.length || idat.size() == 0) return None
    if (w.toLong * h > MaxStatPixels) return None // wsum overflow bound
    val bpp = pngBpp(colorType)
    val stride = 1 + w * bpp
    if (h.toLong * stride > Int.MaxValue) return None
    val raw = new Array[Byte](h * stride)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val got = inf.inflate(raw, off, raw.length - off)
        if (got == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or preset-dictionary stream
        off += got
      }
      if (off != raw.length) return None
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0)
        return None // surplus decompressed bytes
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // scanline filter reconstruction, in place
    var y = 0
    while (y < h) {
      val rowOff = y * stride
      val ft = raw(rowOff) & 0xff
      if (ft > 4) return None
      var x = 1
      while (x < stride) {
        val i = rowOff + x
        val a = if (x > bpp) raw(i - bpp) & 0xff else 0
        val up = if (y > 0) raw(i - stride) & 0xff else 0
        val c = if (x > bpp && y > 0) raw(i - bpp - stride) & 0xff else 0
        val recon = ft match {
          case 0 => raw(i) & 0xff
          case 1 => (raw(i) & 0xff) + a
          case 2 => (raw(i) & 0xff) + up
          case 3 => (raw(i) & 0xff) + (a + up) / 2
          case _ =>
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
            (raw(i) & 0xff) + pred
        }
        raw(i) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    var sum = 0L
    var wsum = 0L
    var min = 255
    var max = 0
    y = 0
    while (y < h) {
      var px = 0
      while (px < w) {
        val i = y * stride + 1 + px * bpp
        val gray =
          if (bpp == 1) raw(i) & 0xff
          else pngLuma(raw(i) & 0xff, raw(i + 1) & 0xff, raw(i + 2) & 0xff)
        sum += gray
        wsum += (y.toLong * w + px) * gray
        if (gray < min) min = gray
        if (gray > max) max = gray
        px += 1
      }
      y += 1
    }
    Some(ImageStats(w, h, sum, min, max, wsum))
  }

  /** Assemble a canonical PNG container around pre-filtered raw
    * scanlines (`raw` = height rows of [filter byte ++ width*bpp
    * samples]): IHDR + one deflated IDAT + IEND, each chunk CRC-32'd.
    * Public so specs can exercise the decoder against hand-built
    * filtered content; [[encodePng]] is the forward-filtering writer.
    */
  def buildPng(width: Int, height: Int, colorType: Int,
      raw: Array[Byte]): Array[Byte] = {
    val bpp = pngBpp(colorType)
    require(bpp > 0, s"unsupported color type $colorType")
    require(raw.length == height * (1 + width * bpp),
      s"raw length ${raw.length} != $height x (1 + $width x $bpp)")
    // BEST_SPEED: the level changes the payload bytes, never the
    // inflated raster — and encode is fixture-side work the decode
    // gate shouldn't be billed 3x for
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngMagic, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def p32(v: Long): Unit =
        (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      p32(data.length.toLong)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      p32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def ip32(off: Int, v: Int): Unit =
      (0 until 4).foreach(i => ihdr(off + i) = ((v >> (8 * (3 - i))) & 0xff).toByte)
    ip32(0, width); ip32(4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth, color type
    chunk("IHDR", ihdr)
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Write a PNG with forward per-row filtering: `sample(i, c)`
    * supplies channel `c` of pixel `i` (row-major), `rowFilter(y)`
    * picks the filter type (0-4) for scanline `y` — cycling it
    * exercises every reconstruction path in [[decodePng]] end-to-end
    * (the oracle recomputes statistics from the UNfiltered pixels, so
    * a wrong Paeth/Average in either direction hash-fails the gate
    * rather than canceling out... the spec additionally pins each
    * filter against hand-computed byte vectors to rule out mirrored
    * encode/decode bugs).
    */
  def encodePng(width: Int, height: Int, colorType: Int,
      sample: (Int, Int) => Int,
      rowFilter: Int => Int = _ % 5): Array[Byte] = {
    val bpp = pngBpp(colorType)
    require(bpp > 0, s"unsupported color type $colorType")
    val stride = 1 + width * bpp
    val orig = new Array[Byte](height * stride) // unfiltered, filter byte 0
    var y = 0
    while (y < height) {
      var px = 0
      while (px < width) {
        var c = 0
        while (c < bpp) {
          orig(y * stride + 1 + px * bpp + c) =
            (sample(y * width + px, c) & 0xff).toByte
          c += 1
        }
        px += 1
      }
      y += 1
    }
    val raw = new Array[Byte](height * stride)
    y = 0
    while (y < height) {
      val rowOff = y * stride
      val ft = rowFilter(y) & 0xff
      require(ft <= 4, s"filter $ft out of range")
      raw(rowOff) = ft.toByte
      var x = 1
      while (x < stride) {
        val i = rowOff + x
        val v = orig(i) & 0xff
        val a = if (x > bpp) orig(i - bpp) & 0xff else 0
        val up = if (y > 0) orig(i - stride) & 0xff else 0
        val c = if (x > bpp && y > 0) orig(i - bpp - stride) & 0xff else 0
        val filtered = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - up
          case 3 => v - (a + up) / 2
          case _ =>
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
            v - pred
        }
        raw(i) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    buildPng(width, height, colorType, raw)
  }
}

