package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[GzipMembers]] (q153) — multi-member gzip walk: boundary
  * tracking, header-flag handling, trailer verification, and
  * quarantine-whole rejection.
  */
class GzipMembersSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x").mkString

  test("walks every member with exact boundaries and digests") {
    val bodies = Seq(
      ("a.warc", "first record body".getBytes("UTF-8")),
      (null, "second, unnamed, and a bit longer body".getBytes("UTF-8")),
      ("c.warc", Array.fill[Byte](10000)(7))) // compresses well
    val rows = GzipMembers.walk(5L,
      GzipMembers.encodeMembers(bodies)).get
    assert(rows.map(_.member) === Vector(0L, 1L, 2L))
    assert(rows.map(_.name) === Vector("a.warc", "", "c.warc"))
    assert(rows.map(_.n_bytes) ===
      bodies.map(_._2.length.toLong).toVector)
    assert(rows.map(_.body_md5) === bodies.map(b => md5hex(b._2)).toVector)
    assert(rows.forall(_.n_members == 3L))
  }

  test("empty bodies and single members round-trip") {
    val rows = GzipMembers.walk(1L,
      GzipMembers.encodeMembers(Seq((null, Array.empty[Byte])))).get
    assert(rows === Vector(GzipMembers.MemberRow(1L, 0L, "",
      0L, md5hex(Array.empty[Byte]), 1L)))
  }

  test("corruption anywhere quarantines the WHOLE shard") {
    val good = GzipMembers.encodeMembers(Seq(
      ("a", "record one body".getBytes),
      ("b", "record two body".getBytes)))
    assert(GzipMembers.walk(0L, good).isDefined)
    // flip a byte in the SECOND member's region: whole walk rejects
    val bad = good.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x01).toByte // ISIZE
    assert(GzipMembers.walk(0L, bad).isEmpty)
    // truncation mid-stream rejects
    assert(GzipMembers.walk(0L, good.dropRight(3)).isEmpty)
    // trailing garbage after the last member rejects
    assert(GzipMembers.walk(0L, good :+ 0x00.toByte).isEmpty)
    // empty payload rejects
    assert(GzipMembers.walk(0L, Array.empty[Byte]).isEmpty)
  }

  test("FHCRC header CRC16 is verified, not skipped") {
    // hand-build a member with FLG=FHCRC: 10-byte base header,
    // CRC16 = low 16 bits of CRC-32 over those header bytes (RFC
    // 1952 §2.3.1), then raw-deflate body + CRC32 + ISIZE trailer
    val body = "fhcrc-protected body".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 2,
      0, 0, 0, 0, 0, 0xff.toByte)
    out.write(hdr)
    val hc = new java.util.zip.CRC32(); hc.update(hdr)
    val c16 = (hc.getValue & 0xffffL).toInt
    out.write(c16 & 0xff); out.write((c16 >> 8) & 0xff)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(body); d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    } finally d.end()
    val crc = new java.util.zip.CRC32(); crc.update(body)
    def p32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    p32(crc.getValue); p32(body.length.toLong)
    val good = out.toByteArray
    val rows = GzipMembers.walk(2L, good).get
    assert(rows.map(_.n_bytes) === Vector(body.length.toLong))
    // a flipped CRC16 quarantines the shard — verified, not skipped
    val bad = good.clone()
    bad(10) = (bad(10) ^ 0x01).toByte
    assert(GzipMembers.walk(2L, bad).isEmpty)
  }

  test("membersFull: bodies round-trip byte-exact in walk order; " +
      "rejection mirrors walk") {
    val bodies = Seq(
      ("a.warc", "first record body".getBytes("UTF-8")),
      (null, "second, unnamed body".getBytes("UTF-8")),
      ("c.warc", Array.fill[Byte](5000)(9)))
    val enc = GzipMembers.encodeMembers(bodies)
    val ms = GzipMembers.membersFull(enc).get
    assert(ms.map(_._1) === Vector("a.warc", "", "c.warc"))
    assert(ms.map(_._2.toSeq) === bodies.map(_._2.toSeq).toVector,
      "bodies must survive the round trip byte-exact")
    // same quarantine-whole posture as the digest walk
    val bad = enc.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x01).toByte
    assert(GzipMembers.membersFull(bad).isEmpty)
    assert(GzipMembers.membersFull(enc.dropRight(3)).isEmpty)
    assert(GzipMembers.membersFull(enc, maxBytes = 16).isEmpty,
      "the bomb bound applies to the bodies-carrying walk too")
  }

  test("the decompression-bomb bound rejects before inflating it all") {
    val big = GzipMembers.encodeMembers(Seq(
      (null, Array.fill[Byte](1 << 20)(0))))
    assert(GzipMembers.walk(0L, big, maxBytes = 1 << 16).isEmpty)
    assert(GzipMembers.walk(0L, big, maxBytes = 1 << 21).isDefined)
  }
}
