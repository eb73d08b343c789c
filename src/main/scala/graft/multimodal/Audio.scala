package graft.multimodal

import java.io.ByteArrayInputStream

import graft.multimodal.Codecs.AudioStats

/** AIFF / AU audio decode via the JDK's bundled readers
  * (`javax.sound.sampled` ships AIFF, AU, and WAV file readers in
  * java.desktop) — the same zero-dependency move as [[Jpeg]]'s
  * ImageIO reader, shrinking the labeled `fmt='gm'` fallback to
  * formats with NO in-JDK codec at all (MP3, video containers).
  *
  * The two ends are INDEPENDENT implementations: encoding is
  * hand-written byte layout below (including AIFF's 80-bit extended
  * sample rate), decoding is the JDK's codec — so a bug in either
  * side breaks the closed-form oracle instead of cancelling out.
  *
  * Handle seam: `javax.sound.sampled.spi.AudioFileReader` providers
  * are discovered through the ServiceLoader registry; scanning it per
  * payload is the cost [[BatchedDecode]]'s per-batch handle exists to
  * amortize, so [[Handle]] caches the provider list for the batch.
  *
  * Reference posture: the reference (ngafid_cpat) has no media path;
  * §2.11 multimodal extension (SURVEY.md), sibling of q129's WAV.
  */
object Audio {

  /** AIFF magic: FORM....AIFF. */
  def sniffAiff(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
      b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      b(11) == 'F'

  /** AU magic: ".snd". */
  def sniffAu(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
      b(3) == 'd'

  /** One cached AudioFileReader provider list — THE per-batch handle
    * (the ServiceLoader scan is the per-call cost to amortize).
    */
  final class Handle {
    private var readersOrNull: List[javax.sound.sampled.spi.AudioFileReader] =
      null
    private[Audio] def readers(): List[javax.sound.sampled.spi.AudioFileReader] = {
      if (readersOrNull == null) {
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        val buf = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        while (it.hasNext) buf += it.next()
        readersOrNull = buf.result()
      }
      readersOrNull
    }
    def close(): Unit = readersOrNull = null
  }

  /** Decode an AIFF or AU payload to sample statistics through a
    * reusable [[Handle]]; None on malformation, non-PCM16-mono
    * layouts, or past the [[Codecs.MaxStatSamples]] wsum bound
    * (checked from the frame count BEFORE the sample bytes are read).
    * Statistics match [[Codecs.decodeWav]] exactly: sumAbs, raw
    * min/max, order-sensitive wsum = Σ i·|s(i)|.
    */
  def decodeWith(h: Handle, b: Array[Byte]): Option[AudioStats] = {
    if (!sniffAiff(b) && !sniffAu(b)) return None
    val streamOpt = h.readers().iterator.flatMap { r =>
      try Some(r.getAudioInputStream(new ByteArrayInputStream(b)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }.take(1).toList.headOption
    streamOpt.flatMap { in =>
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val pcm16mono =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!pcm16mono || frames < 0 || frames > Codecs.MaxStatSamples)
          None
        else {
          val n = frames.toInt
          val big = fmt.isBigEndian
          val bytes = in.readNBytes(n * 2)
          if (bytes.length != n * 2) None
          else {
            var sumAbs = 0L
            var wsum = 0L
            var min = Int.MaxValue
            var max = Int.MinValue
            var i = 0
            while (i < n) {
              val s =
                if (big)
                  ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort.toInt
                else
                  ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
              sumAbs += math.abs(s)
              wsum += i.toLong * math.abs(s)
              if (s < min) min = s
              if (s > max) max = s
              i += 1
            }
            if (n == 0) { min = 0; max = 0 }
            Some(AudioStats(math.round(fmt.getSampleRate), n,
              sumAbs, min, max, wsum))
          }
        }
      } catch {
        case _: java.io.IOException => None
      } finally in.close()
    }
  }

  /** One-shot decode (spec convenience). */
  def decode(b: Array[Byte]): Option[AudioStats] = {
    val h = new Handle
    try decodeWith(h, b) finally h.close()
  }

  // ---- encoders (hand-written byte layout, independent of the JDK) --

  /** 80-bit IEEE extended float of a positive integer (AIFF's COMM
    * sample-rate field): 15-bit biased exponent + 64-bit mantissa
    * with the leading 1 EXPLICIT.
    */
  private def extended80(v: Long): Array[Byte] = {
    val out = new Array[Byte](10)
    if (v > 0) {
      val p = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val exp = 16383 + p
      val mant = v << (63 - p)
      out(0) = ((exp >> 8) & 0xff).toByte
      out(1) = (exp & 0xff).toByte
      (0 until 8).foreach(i =>
        out(2 + i) = ((mant >>> (56 - 8 * i)) & 0xff).toByte)
    }
    out
  }

  /** Write a canonical PCM16BE mono AIFF (FORM/AIFF with COMM + SSND,
    * zero SSND offset/block).
    */
  def encodeAiff(sampleRate: Int, nSamples: Int,
      sample: Int => Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](54 + dataLen)
    def put(off: Int, s: String): Unit =
      (0 until s.length).foreach(i => out(off + i) = s.charAt(i).toByte)
    def p16(off: Int, v: Int): Unit = {
      out(off) = ((v >> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte
    }
    def p32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i =>
        out(off + i) = ((v >> (24 - 8 * i)) & 0xff).toByte)
    put(0, "FORM"); p32(4, 46L + dataLen); put(8, "AIFF")
    put(12, "COMM"); p32(16, 18L)
    p16(20, 1) // channels
    p32(22, nSamples.toLong) // frames
    p16(26, 16) // bits
    System.arraycopy(extended80(sampleRate.toLong), 0, out, 28, 10)
    put(38, "SSND"); p32(42, 8L + dataLen); p32(46, 0L); p32(50, 0L)
    var i = 0
    while (i < nSamples) {
      p16(54 + i * 2, sample(i).toShort & 0xffff)
      i += 1
    }
    out
  }

  /** Write a canonical Sun AU (".snd", 24-byte header, encoding 3 =
    * PCM16 big-endian, mono).
    */
  def encodeAu(sampleRate: Int, nSamples: Int,
      sample: Int => Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](24 + dataLen)
    def put(off: Int, s: String): Unit =
      (0 until s.length).foreach(i => out(off + i) = s.charAt(i).toByte)
    def p32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i =>
        out(off + i) = ((v >> (24 - 8 * i)) & 0xff).toByte)
    def p16(off: Int, v: Int): Unit = {
      out(off) = ((v >> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte
    }
    put(0, ".snd"); p32(4, 24L); p32(8, dataLen.toLong)
    p32(12, 3L) // 16-bit linear PCM
    p32(16, sampleRate.toLong); p32(20, 1L) // mono
    var i = 0
    while (i < nSamples) {
      p16(24 + i * 2, sample(i).toShort & 0xffff)
      i += 1
    }
    out
  }
}
