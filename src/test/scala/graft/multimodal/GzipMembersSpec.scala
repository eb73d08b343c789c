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

  test("the decompression-bomb bound rejects before inflating it all") {
    val big = GzipMembers.encodeMembers(Seq(
      (null, Array.fill[Byte](1 << 20)(0))))
    assert(GzipMembers.walk(0L, big, maxBytes = 1 << 16).isEmpty)
    assert(GzipMembers.walk(0L, big, maxBytes = 1 << 21).isDefined)
  }
}
