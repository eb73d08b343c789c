package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4]] (q151) — BMFF box walk: field extraction, pre-order
  * walk-order statistics, unknown-box skipping, and malformation
  * rejection.
  */
class Mp4Spec extends AnyFunSuite {

  private def enc(nTracks: Int = 2, mdat: Int = 50) =
    Mp4.encode("isom", 600L, 1800L,
      (0 until nTracks).map(k => (640 + k, 360 + k)), mdat)

  test("probe extracts every planted field") {
    val m = Mp4.probe(7L, enc()).get
    assert(m.media_id === 7L)
    assert(m.brand === "isom")
    assert(m.timescale === 600L)
    assert(m.duration_ms === 1800L * 1000 / 600) // exactly 3000
    assert(m.n_tracks === 2L)
    assert(m.w0 === 640L && m.h0 === 360L, "first track's 16.16 dims")
    assert(m.mdat_bytes === 50L)
  }

  test("walk-order statistics: pre-order sizes, 0-based index") {
    val m = Mp4.probe(0L, enc(nTracks = 1, mdat = 10)).get
    // walk order: ftyp(24), moov(216), mvhd(108), trak(100),
    // tkhd(92), mdat(18)
    val sizes = Seq(24L, 216L, 108L, 100L, 92L, 18L)
    assert(m.n_boxes === sizes.length.toLong)
    assert(m.wsum_boxes ===
      sizes.zipWithIndex.map { case (s, i) => i.toLong * s }.sum)
  }

  test("unknown top-level boxes are skipped by size but counted") {
    val base = enc(nTracks = 1, mdat = 10)
    // splice a 16-byte 'free' box between ftyp (24 bytes) and moov
    val free = Array[Byte](0, 0, 0, 16, 'f', 'r', 'e', 'e',
      1, 2, 3, 4, 5, 6, 7, 8)
    val spliced = base.take(24) ++ free ++ base.drop(24)
    val m = Mp4.probe(1L, spliced).get
    assert(m.n_boxes === 7L, "the free box joins the walk")
    assert(m.brand === "isom" && m.n_tracks === 1L,
      "fields unaffected by the splice")
  }

  test("ISO-BMFF special sizes: largesize (1) and to-EOF (0)") {
    def u32be(v: Long) = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val base = enc(nTracks = 1, mdat = 10) // ...ftyp(24)+moov(216)+mdat(18)
    val head = base.dropRight(18)
    val body = base.takeRight(10)
    // size==1: 64-bit largesize follows the type (the large-mdat form
    // real video shards carry); box = 16-byte header + 10-byte body
    val large = head ++ u32be(1) ++ "mdat".getBytes("ISO-8859-1") ++
      u32be(0) ++ u32be(26) ++ body
    val m1 = Mp4.probe(3L, large).get
    assert(m1.mdat_bytes === 10L, "largesize minus the 16-byte header")
    assert(m1.n_boxes === 6L)
    // size==0: box extends to end of file (legal for the last box)
    val toEof = head ++ u32be(0) ++ "mdat".getBytes("ISO-8859-1") ++ body
    val m0 = Mp4.probe(4L, toEof).get
    assert(m0.mdat_bytes === 10L, "to-EOF minus the 8-byte header")
    // wsum prices the EFFECTIVE size so walk-order stats stay honest
    assert(m1.wsum_boxes - m0.wsum_boxes === 5L * (26L - 18L))
    // truncated largesize header still rejects
    assert(Mp4.probe(0L, head ++ u32be(1) ++
      "mdat".getBytes("ISO-8859-1") ++ u32be(0)).isEmpty)
  }

  test("size==0 in a NESTED scope rejects (14496-12 §4.2: last " +
      "top-level box only)") {
    // corrupt the mvhd's declared size to 0: a lenient walk would
    // swallow the sibling trak as mvhd body (nTracks undercount);
    // the probe must reject the file instead
    val base = enc(nTracks = 1, mdat = 10)
    val corrupted = base.clone()
    // mvhd size field sits at ftyp(24) + moov header(8)
    corrupted(24 + 8) = 0; corrupted(24 + 9) = 0
    corrupted(24 + 10) = 0; corrupted(24 + 11) = 0
    assert(Mp4.probe(0L, corrupted).isEmpty,
      "nested size==0 must fail the probe, not swallow siblings")
    // the r16-advice case: when the CONTAINER is the last top-level
    // box, the nested scope ends exactly at the file end — inferring
    // "top level" from end == file length would re-admit the corrupt
    // zero size here (swallowing the trak, undercounting nTracks);
    // the explicit depth flag must still reject it
    val moovLast = base.dropRight(18) // drop mdat: moov is now last
    assert(Mp4.probe(0L, moovLast).map(_.n_tracks) === Some(1L),
      "moov-last layout is itself valid")
    val corruptedLast = moovLast.clone()
    corruptedLast(24 + 8) = 0; corruptedLast(24 + 9) = 0
    corruptedLast(24 + 10) = 0; corruptedLast(24 + 11) = 0
    assert(Mp4.probe(0L, corruptedLast).isEmpty,
      "nested size==0 must reject even when the scope ends at EOF")
  }

  test("malformed payloads are rejected, not thrown") {
    assert(Mp4.probe(0L, Array.empty[Byte]).isEmpty)
    assert(Mp4.probe(0L, "notanmp4".getBytes).isEmpty)
    val good = enc()
    assert(Mp4.probe(0L, good.take(40)).isEmpty, "truncated moov")
    // a box whose size overruns the buffer must reject
    val bad = good.clone()
    bad(0) = 0x7f.toByte // ftyp size becomes enormous
    assert(Mp4.probe(0L, bad).isEmpty)
    // mvhd version 1 (64-bit times) is out of this probe's scope
    val v1 = good.clone()
    v1(24 + 8 + 8) = 1 // version byte of mvhd (ftyp 24 + moov hdr 8 + mvhd hdr 8)
    assert(Mp4.probe(0L, v1).isEmpty)
  }
}
