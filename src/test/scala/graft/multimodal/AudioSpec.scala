package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Audio (AIFF/AU) round-trips: hand-written encoders vs the JDK's
  * javax.sound readers — independent ends, so agreement here is what
  * the q144 oracle's closed forms rest on.
  */
class AudioSpec extends AnyFunSuite {

  private def samples(n: Int): Int => Int =
    i => ((i * 37) % 4001) - 2000

  test("AIFF round-trip: rate (80-bit extended), count, stats") {
    // rates cover powers of two, the planted 8000..15000 family, and
    // odd values — the extended-float encode must hit all exactly
    for (rate <- Seq(1, 2, 8000, 11025, 12000, 15000, 44100, 48000, 65536);
         n <- Seq(1, 64, 191)) {
      val b = Audio.encodeAiff(rate, n, samples(n))
      val s = Audio.decode(b).getOrElse(fail(s"AIFF rate=$rate n=$n failed"))
      assert(s.sampleRate == rate)
      assert(s.nSamples == n)
      val exp = (0 until n).map(samples(n))
      assert(s.min == exp.min && s.max == exp.max)
      assert(s.sumAbs == exp.map(v => math.abs(v).toLong).sum)
      assert(s.wsum == exp.zipWithIndex.map { case (v, i) =>
        i.toLong * math.abs(v) }.sum)
    }
  }

  test("AU round-trip: rate, count, stats") {
    for (rate <- Seq(8000, 15000, 44100); n <- Seq(1, 64, 191)) {
      val b = Audio.encodeAu(rate, n, samples(n))
      val s = Audio.decode(b).getOrElse(fail(s"AU rate=$rate n=$n failed"))
      assert(s.sampleRate == rate && s.nSamples == n)
      val exp = (0 until n).map(samples(n))
      assert(s.sumAbs == exp.map(v => math.abs(v).toLong).sum)
      assert(s.wsum == exp.zipWithIndex.map { case (v, i) =>
        i.toLong * math.abs(v) }.sum)
    }
  }

  test("wsum order sensitivity: reversed samples change wsum only") {
    val n = 50
    val fwd = Audio.decode(Audio.encodeAu(8000, n, samples(n))).get
    val rev = Audio.decode(
      Audio.encodeAu(8000, n, i => samples(n)(n - 1 - i))).get
    assert(fwd.sumAbs == rev.sumAbs && fwd.min == rev.min &&
      fwd.max == rev.max)
    assert(fwd.wsum != rev.wsum)
  }

  test("rejection: wrong magic, truncation, non-PCM16 AU encoding") {
    assert(Audio.decode("nope".getBytes).isEmpty)
    val aiff = Audio.encodeAiff(8000, 64, samples(64))
    assert(Audio.decode(aiff.take(40)).isEmpty) // truncated header/body
    // AU with encoding 1 (mu-law) must not be claimed as PCM16
    val au = Audio.encodeAu(8000, 64, samples(64))
    au(15) = 1
    assert(Audio.decode(au).isEmpty)
  }

  test("handle reuse: one provider scan serves many decodes") {
    val h = new Audio.Handle
    try {
      for (id <- 0 until 10) {
        val enc = if (id % 2 == 0) Audio.encodeAiff _ else Audio.encodeAu _
        val s = Audio.decodeWith(h, enc(8000 + id, 64, samples(64)))
        assert(s.exists(_.nSamples == 64))
      }
    } finally h.close()
  }
}
