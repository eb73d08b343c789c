package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Phash (dHash) invariants the q140/q141 fixture and oracle rest on:
  * brightness invariance, the local-edit flip bound, exact box math
  * on non-divisible dimensions, and PGM/JPEG path agreement.
  */
class PhashSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): Int => Int =
    i => f(i % w, i / w) & 0xff

  test("uniform brightness shift leaves the hash unchanged") {
    val f = (x: Int, y: Int) => (x * 7 + y * 13) % 180
    val a = Phash.dhashLimbs(36, 16, gray(36, 16, f)).get
    val b = Phash.dhashLimbs(36, 16, gray(36, 16, (x, y) => f(x, y) + 40)).get
    assert(Phash.hamming(a, b) == 0)
  }

  test("one edited grid cell flips at most 2 bits") {
    val f = (x: Int, y: Int) => (x * 31 + y * 17) % 150
    val a = Phash.dhashLimbs(36, 16, gray(36, 16, f)).get
    // bump ONE dHash cell (cx=3, cy=5): pixels x in 12..15, y in 10..11
    val g = (x: Int, y: Int) =>
      f(x, y) + (if (x / 4 == 3 && y / 2 == 5) 90 else 0)
    val b = Phash.dhashLimbs(36, 16, gray(36, 16, g)).get
    assert(Phash.hamming(a, b) <= 2)
  }

  test("grid-divisible and non-divisible dimensions both hash (box math)") {
    // 37x17 is not divisible by 9x8 — boxes have unequal counts, the
    // cross-multiplied compare must still be exact and total
    val f = (x: Int, y: Int) => (x * 3 + y * 5 + x * y) % 251
    assert(Phash.dhashLimbs(37, 17, gray(37, 17, f)).isDefined)
    assert(Phash.dhashLimbs(9, 8, gray(9, 8, f)).isDefined)
    // smaller than the grid -> None (a box would be empty)
    assert(Phash.dhashLimbs(8, 8, gray(8, 8, f)).isEmpty)
    assert(Phash.dhashLimbs(9, 7, gray(9, 7, f)).isEmpty)
  }

  test("limbs stay within 16 bits") {
    val f = (x: Int, y: Int) => ((x + 1) * (y + 3) * 7) % 256
    val limbs = Phash.dhashLimbs(45, 24, gray(45, 24, f)).get
    assert(limbs.forall(l => l >= 0 && l < 65536))
  }

  test("PGM path equals the accessor path") {
    val f = (x: Int, y: Int) => (x * 11 + y * 29) % 200
    val pgm = Codecs.encodePgm(36, 16, i => f(i % 36, i / 36))
    val viaPgm = Phash.dhashPgm(pgm).get
    val direct = Phash.dhashLimbs(36, 16, gray(36, 16, f)).get
    assert(viaPgm.sameElements(direct))
  }

  test("JPEG path equals the accessor path on block-constant rasters") {
    // block-constant gray at quality 1.0 round-trips exactly (the
    // q138 invariant), so the decoded raster IS the planted one and
    // the two dHash paths must agree bit-for-bit. 72x16: 8-px cells
    // per dHash box row-wise; use 8x8-block values so the JPEG is in
    // its exact regime AND cells vary.
    val w = 72; val h = 16
    val bv = (bi: Int) => (bi * 53 + 11) % 256
    val jpeg = Jpeg.encodeBlockGray(w, h, bv)
    val hnd = new Jpeg.Handle
    val viaJpeg =
      try Jpeg.dhashWith(hnd, jpeg).get
      finally hnd.close()
    val direct = Phash.dhashLimbs(w, h,
      gray(w, h, (x, y) => bv((y / 8) * (w / 8) + x / 8))).get
    assert(viaJpeg.sameElements(direct))
  }

  test("dhashPgm rejects malformed payloads") {
    assert(Phash.dhashPgm(Array[Byte]('P', '6')).isEmpty)
    assert(Phash.dhashPgm("P5\n4 4\n255\nab".getBytes).isEmpty) // truncated
  }
}
