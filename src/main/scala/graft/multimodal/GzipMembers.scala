package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Multi-member gzip walk — the WARC/Common-Crawl ingest boundary:
  * crawl archives are CONCATENATED gzip members (one record per
  * member, so a reader can seek to any record without inflating the
  * whole file), and a training-data pipeline's first real step is
  * exploding those members into per-record rows. `GZIPInputStream`
  * hides member boundaries by design, so the walk here is manual:
  * parse each member's header (FLG bits FNAME/FEXTRA/FCOMMENT/FHCRC
  * all handled), inflate its deflate stream with a raw
  * `Inflater(nowrap)`, verify the CRC32 + ISIZE trailer, and advance
  * by the member's exact compressed length.
  *
  * Encoder and decoder share only the JDK's zlib (the same posture
  * as the ZIP walk in [[Archives]]): [[encodeMembers]] writes
  * headers by hand and compresses with `Deflater`; the walk inflates
  * with `Inflater` and re-derives everything else itself. The DuckDB
  * oracle recomputes member bodies closed-form from doc_id (bodies
  * are lossless through gzip), so header-walk bugs, trailer-check
  * bugs, and boundary drift all hash-fail.
  *
  * Reference posture: the reference (ngafid_cpat) has no archive
  * path; §2.11 multimodal extension (SURVEY.md), sibling of
  * q136 (ZIP) / q137 (tar).
  */
object GzipMembers {

  final case class MemberRow(media_id: Long, member: Long, name: String,
      n_bytes: Long, body_md5: String, n_members: Long)

  /** gzip magic. */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte &&
      b(2) == 8

  private val FHCRC = 2
  private val FEXTRA = 4
  private val FNAME = 8
  private val FCOMMENT = 16

  /** Walk all members; None on ANY malformation (bad magic, CRC or
    * ISIZE mismatch, truncated header/stream, trailing garbage) —
    * a crawl shard that fails its checksums quarantines whole.
    */
  def walk(mediaId: Long, b: Array[Byte],
      maxBytes: Long = 1L << 26): Option[Vector[MemberRow]] =
    walkDetail(mediaId, b, maxBytes).toOption

  /** [[walk]] with the failure NAMED ([[Archives.zipEntriesDetail]]'s
    * contract): Left("too_large") when the cumulative decompressed
    * size exceeds `maxBytes` — an oversized-but-valid shard, distinct
    * from Left("checksum_or_framing") for genuine corruption.
    */
  def walkDetail(mediaId: Long, b: Array[Byte],
      maxBytes: Long = 1L << 26): Either[String, Vector[MemberRow]] = {
    val tooLarge = new Array[Boolean](1)
    walkImpl(mediaId, b, maxBytes, tooLarge) match {
      case Some(rows) => Right(rows)
      case None =>
        Left(if (tooLarge(0)) "too_large" else "checksum_or_framing")
    }
  }

  /** Bodies-carrying strict walk — the container-front ingest form
    * ([[Archives.zipMembersFull]]'s gzip sibling): the same
    * verify-everything posture (header bits, CRC32 + ISIZE trailer,
    * bomb bound), returning (name, body) per member in walk order;
    * name is "" for members without FNAME. None quarantines whole.
    */
  def membersFull(b: Array[Byte], maxBytes: Long = 1L << 26)
      : Option[Vector[(String, Array[Byte])]] = {
    val bodies = Vector.newBuilder[Array[Byte]]
    walkImpl(0L, b, maxBytes, new Array[Boolean](1), bodies)
      .map(rows => rows.map(_.name).zip(bodies.result()))
  }

  private def walkImpl(mediaId: Long, b: Array[Byte],
      maxBytes: Long, tooLarge: Array[Boolean],
      bodies: scala.collection.mutable.Builder[
        Array[Byte], Vector[Array[Byte]]] = null)
      : Option[Vector[MemberRow]] = {
    val out = Vector.newBuilder[MemberRow]
    var off = 0
    var idx = 0L
    var total = 0L
    while (off < b.length) {
      if (off + 10 > b.length || b(off) != 0x1f.toByte ||
        b(off + 1) != 0x8b.toByte || b(off + 2) != 8) return None
      val flg = b(off + 3) & 0xff
      var p = off + 10
      if ((flg & FEXTRA) != 0) {
        if (p + 2 > b.length) return None
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      var name = ""
      if ((flg & FNAME) != 0) {
        val start = p
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        name = new String(b, start, p - start, "ISO-8859-1")
        p += 1
      }
      if ((flg & FCOMMENT) != 0) {
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & FHCRC) != 0) {
        // RFC 1952 §2.3.1: CRC16 = low 16 bits of the CRC-32 over all
        // header bytes up to (not including) the CRC16 itself. The
        // verify-everything posture means a corrupted header fails
        // loud like a corrupted body, not "skipped unverified".
        if (p + 2 > b.length) return None
        val hc = new CRC32()
        hc.update(b, off, p - off)
        val stored = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        if ((hc.getValue & 0xffffL) != stored) return None
        p += 2
      }
      if (p > b.length) return None
      val inf = new Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val crc = new CRC32()
        val buf = new Array[Byte](8192)
        val md5 = java.security.MessageDigest.getInstance("MD5")
        val bodyBuf =
          if (bodies != null) new java.io.ByteArrayOutputStream() else null
        var n = 0L
        while (!inf.finished()) {
          val k = try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (k == 0 && !inf.finished()) return None // truncated
          crc.update(buf, 0, k)
          md5.update(buf, 0, k)
          if (bodyBuf != null) bodyBuf.write(buf, 0, k)
          n += k
          total += k
          if (total > maxBytes) { // decompression-bomb bound
            tooLarge(0) = true
            return None
          }
        }
        val used = inf.getBytesRead.toInt
        val tOff = p + used
        if (tOff + 8 > b.length) return None
        def u32le(o: Int): Long =
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        if (u32le(tOff) != crc.getValue) return None
        if (u32le(tOff + 4) != (n & 0xffffffffL)) return None
        out += MemberRow(mediaId, idx, name, n,
          md5.digest().map(x => f"$x%02x").mkString, 0L)
        if (bodies != null) bodies += bodyBuf.toByteArray
        idx += 1
        off = tOff + 8
      } finally inf.end()
    }
    if (idx == 0) return None
    val rows = out.result()
    Some(rows.map(_.copy(n_members = idx)))
  }

  /** Hand-written multi-member gzip: each (name, body) becomes one
    * member — FNAME header when `name` is non-null, raw Deflater
    * stream, CRC32 + ISIZE trailer.
    */
  def encodeMembers(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, body) =>
      val flg = if (name != null) FNAME else 0
      out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, flg.toByte,
        0, 0, 0, 0, 0, 0xff.toByte)) // mtime 0, xfl 0, os unknown
      if (name != null) {
        out.write(name.getBytes("ISO-8859-1")); out.write(0)
      }
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(body); d.finish()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      } finally d.end()
      val crc = new CRC32(); crc.update(body)
      def p32(v: Long): Unit =
        (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      p32(crc.getValue); p32(body.length.toLong)
    }
    out.toByteArray
  }
}
