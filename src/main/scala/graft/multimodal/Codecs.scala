package graft.multimodal

/** Pure-JVM media decoders for the two dependency-free formats the
  * container CAN decode for real — header + raster/sample math only,
  * no codec library:
  *
  *  - PGM ("P5" binary, 8-bit): the netpbm grayscale raster. Header
  *    is ASCII tokens (magic, width, height, maxval) separated by
  *    whitespace with `#`-to-EOL comments, then exactly width*height
  *    gray bytes.
  *  - WAV (RIFF "WAVE", PCM signed 16-bit little-endian, mono):
  *    chunked container; the "fmt " chunk declares PCM16/mono, the
  *    "data" chunk carries the samples. Unknown chunks are skipped
  *    (word-aligned, per RIFF).
  *
  * These close the one honest capability gap the earlier rounds
  * documented at the `===STUB===` seam (MultimodalOps.scala /
  * BatchedDecode.scala): pixel/sample decode used to be faked for
  * EVERY format because the sandbox ships no codec libraries; for
  * these two formats it is now real. Compressed formats (JPEG, MP3,
  * H.264 ...) still route to the deterministic fallback — the seam
  * and batching are unchanged, a JNI/imageio decoder drops in the
  * same way these did.
  *
  * Decoders return reduced STATISTICS, not rasters: at 100 TB the
  * decode worker must emit compact typed rows, never re-materialized
  * pixel arrays (the payload column already holds the bytes; anything
  * downstream of decode that needs full rasters reads them inside the
  * same worker).
  */
object Codecs {

  /** Decoded image summary: `sum`/`min`/`max` over the gray raster. */
  final case class ImageStats(width: Int, height: Int, sum: Long,
      min: Int, max: Int)

  /** Decoded audio summary: `sumAbs` over samples, raw min/max. */
  final case class AudioStats(sampleRate: Int, nSamples: Int,
      sumAbs: Long, min: Int, max: Int)

  // ---- PGM (P5) ----

  /** Parse a binary PGM payload; None on any malformation (bad magic,
    * truncated raster, maxval > 255 — 16-bit PGM is out of scope).
    */
  def decodePgm(b: Array[Byte]): Option[ImageStats] = {
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
    } yield {
      var sum = 0L
      var min = 255
      var max = 0
      var i = raster
      val end = raster + w * h
      while (i < end) {
        val px = b(i) & 0xff
        sum += px
        if (px < min) min = px
        if (px > max) max = px
        i += 1
      }
      ImageStats(w, h, sum, min, max)
    }
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
  def decodeWav(b: Array[Byte]): Option[AudioStats] = {
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
    var sumAbs = 0L
    var min = Int.MaxValue
    var max = Int.MinValue
    var i = 0
    while (i < n) {
      val s = s16le(b, dataOff + i * 2)
      sumAbs += math.abs(s)
      if (s < min) min = s
      if (s > max) max = s
      i += 1
    }
    if (n == 0) { min = 0; max = 0 }
    Some(AudioStats(rate, n, sumAbs, min, max))
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
}
