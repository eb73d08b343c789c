package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Tiff]] (q152) — IFD walk: both byte orders, ASCII dereference,
  * ascending-tag enforcement, malformation rejection.
  */
class TiffSpec extends AnyFunSuite {

  test("round-trip in both byte orders") {
    for (le <- Seq(true, false)) {
      val m = Tiff.probe(3L,
        Tiff.encode(le, 640, 480, 16, 6, "CAM7")).get
      assert(m.endian === (if (le) "II" else "MM"))
      assert(m.width === 640L && m.height === 480L)
      assert(m.bps === 16L && m.orientation === 6L)
      assert(m.make === "CAM7")
      assert(m.n_entries === 5L)
      assert(m.wsum_tags === (257 + 2 * 258 + 3 * 271 + 4 * 274).toLong)
    }
  }

  test("the two encodings differ byte-wise but probe identically") {
    val ii = Tiff.encode(littleEndian = true, 100, 80, 8, 1, "CAM0")
    val mm = Tiff.encode(littleEndian = false, 100, 80, 8, 1, "CAM0")
    assert(!ii.sameElements(mm), "endianness must change the bytes")
    val a = Tiff.probe(0L, ii).get
    val b = Tiff.probe(0L, mm).get
    assert(a.copy(endian = "X") === b.copy(endian = "X"))
  }

  test("unsorted tags are rejected (spec rule)") {
    val good = Tiff.encode(littleEndian = true, 10, 10, 8, 1, "CAM1")
    // swap the first two entries' tag ids (256 <-> 257): LE tag at
    // IFD+2 (offset 10) and IFD+14 (offset 22)
    val bad = good.clone()
    bad(10) = (257 & 0xff).toByte; bad(11) = 1
    bad(22) = (256 & 0xff).toByte; bad(23) = 1
    assert(Tiff.probe(0L, bad).isEmpty)
  }

  test("malformed payloads are rejected, not thrown") {
    assert(Tiff.probe(0L, Array.empty[Byte]).isEmpty)
    assert(Tiff.probe(0L, "XXYY".getBytes).isEmpty)
    val good = Tiff.encode(littleEndian = true, 10, 10, 8, 1, "CAM1")
    assert(Tiff.probe(0L, good.take(12)).isEmpty, "truncated IFD")
    // Make value offset past the buffer must reject
    val bad = good.clone()
    // Make is entry 4 (0-based 3): value field at 8 + 2 + 3*12 + 8
    val valOff = 8 + 2 + 3 * 12 + 8
    bad(valOff) = 0x7f.toByte
    assert(Tiff.probe(0L, bad).isEmpty)
  }
}
