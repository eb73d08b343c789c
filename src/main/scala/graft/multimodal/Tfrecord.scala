package graft.multimodal

import java.util.zip.CRC32C

/** TFRecord framing + protobuf wire-format probe — the TensorFlow
  * data boundary: training shards are TFRecord files (per record:
  * u64le length, masked-CRC32C of the length bytes, the payload,
  * masked-CRC32C of the payload) whose payloads are protobuf
  * `Example` messages. Both layers are walked for real here:
  *
  *  - FRAMING: the decoder verifies BOTH masked checksums per record
  *    (mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8, the
  *    TF/LevelDB rule; CRC32C is the JDK's `java.util.zip.CRC32C`)
  *    and advances by exact lengths — a shard failing any check
  *    quarantines WHOLE (the q153 rule).
  *  - PAYLOAD: a generic protobuf field walk — varint decode,
  *    unknown fields skipped by wire type — extracting field 1
  *    (varint) and field 2 (length-delimited bytes, reduced to md5).
  *
  * Encoder and decoder share only the JDK's CRC32C; varint encode
  * and decode are independent hand-written ends, and the DuckDB
  * oracle recomputes field values, body lengths (including the
  * varint-width arithmetic), and digests closed-form from doc_id.
  *
  * Reference posture: the reference (ngafid_cpat) has no
  * serialization path; §2.11 multimodal extension (SURVEY.md),
  * sibling of q136/q137/q153.
  */
object Tfrecord {

  final case class RecordRow(media_id: Long, rec: Long, n_bytes: Long,
      f1: Long, f2_md5: String, n_records: Long)

  private val MaskDelta = 0xa282ead8L

  /** TF's masked CRC: rotate right 15, add the delta (mod 2^32). */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xffffffffL
  }

  private def varintLen(v: Long): Int = {
    var n = 1
    var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Protobuf payload: field 1 varint `f1`, field 2 length-delimited
    * `f2`.
    */
  def encodeExample(f1: Long, f2: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](1 + varintLen(f1) + 1 +
      varintLen(f2.length.toLong) + f2.length)
    var off = 0
    def putVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out(off) = ((v & 0x7f) | 0x80).toByte; off += 1; v >>>= 7
      }
      out(off) = v.toByte; off += 1
    }
    out(off) = 0x08; off += 1 // field 1, wire type 0 (varint)
    putVarint(f1)
    out(off) = 0x12; off += 1 // field 2, wire type 2 (LEN)
    putVarint(f2.length.toLong)
    f2.copyToArray(out, off)
    out
  }

  /** Frame payloads as a TFRecord shard. */
  def encodeShard(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    payloads.foreach { p =>
      val lenBytes = new Array[Byte](8)
      (0 until 8).foreach(i =>
        lenBytes(i) = ((p.length.toLong >> (8 * i)) & 0xff).toByte)
      out.write(lenBytes)
      p32(maskedCrc(lenBytes, 0, 8))
      out.write(p)
      p32(maskedCrc(p, 0, p.length))
    }
    out.toByteArray
  }

  /** Walk a shard; None on ANY malformation (bad length, either CRC
    * mismatch, truncation, protobuf walk failure, trailing garbage).
    */
  def walk(mediaId: Long, b: Array[Byte],
      maxBytes: Long = 1L << 26): Option[Vector[RecordRow]] = {
    def u32le(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def u64le(o: Int): Long =
      (0 until 8).map(i => (b(o + i) & 0xffL) << (8 * i)).reduce(_ | _)
    val out = Vector.newBuilder[RecordRow]
    var off = 0
    var idx = 0L
    var total = 0L
    while (off < b.length) {
      if (off + 12 > b.length) return None
      val len = u64le(off)
      if (len < 0 || len > maxBytes - total) return None
      if (u32le(off + 8) != maskedCrc(b, off, 8)) return None
      val body = off + 12
      if (body + len + 4 > b.length) return None
      if (u32le(body + len.toInt) != maskedCrc(b, body, len.toInt))
        return None
      total += len
      // protobuf walk
      var p = body
      val end = body + len.toInt
      var f1 = -1L
      var f2Md5: String = null
      def varint(): Long = {
        var v = 0L
        var shift = 0
        var more = true
        while (more) {
          if (p >= end || shift > 63) { p = Int.MaxValue; return -1L }
          val x = b(p) & 0xff
          // at shift 63 only bit 0 still fits in the Long: any higher
          // value bit (0x7e) or a continuation bit (0x80) makes the
          // varint overlong/overflowing — malformed, not truncatable
          if (shift == 63 && (x & 0xfe) != 0) { p = Int.MaxValue; return -1L }
          v |= (x & 0x7fL) << shift
          more = (x & 0x80) != 0
          shift += 7
          p += 1
        }
        v
      }
      while (p < end) {
        val key = varint()
        if (p > end) return None
        val field = key >>> 3
        (key & 7) match {
          case 0 =>
            val v = varint()
            if (p > end) return None
            if (field == 1L) f1 = v
          case 2 =>
            val l = varint()
            if (p > end || l < 0 || p + l > end) return None
            if (field == 2L) {
              val md5 = java.security.MessageDigest.getInstance("MD5")
              md5.update(b, p, l.toInt)
              f2Md5 = md5.digest().map(x => f"$x%02x").mkString
            }
            p += l.toInt
          case _ => return None // wire types 1/5 unused in this corpus
        }
      }
      if (f1 < 0 || f2Md5 == null) return None
      out += RecordRow(mediaId, idx, len, f1, f2Md5, 0L)
      idx += 1
      off = body + len.toInt + 4
    }
    if (idx == 0) return None
    Some(out.result().map(_.copy(n_records = idx)))
  }
}
