package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[AudioHash]] (q155) — energy-delta fingerprint invariants. */
class AudioHashSpec extends AnyFunSuite {

  private def gen(seed: Long): Array[Int] =
    Array.tabulate(AudioHash.MinSamples) { i =>
      val v = (seed * 2654435761L + i * 40503L) % 1000003L
      (v * v % 1000003L % 4001L - 2000L).toInt
    }

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(l => Integer.bitCount(a(l) ^ b(l))).sum

  test("gain scaling fingerprints identically (any positive factor)") {
    val s = gen(11L)
    val h = AudioHash.limbs(s).get
    for (factor <- Seq(2, 3, 7)) {
      val scaled = s.map(_ * factor)
      assert(AudioHash.limbs(scaled).get.toSeq === h.toSeq,
        s"gain x$factor must preserve every energy comparison")
    }
  }

  test("a 2-frame splice flips at most 3 bits") {
    val s = gen(12L)
    val edited = s.clone()
    for (i <- 480 until 512) // frames 30 and 31
      edited(i) = ((i * 977) % 4001) - 2000
    val d = ham(AudioHash.limbs(s).get, AudioHash.limbs(edited).get)
    assert(d <= 3, s"2 touched frames bound 3 delta bits, got $d")
  }

  test("unrelated signals sit far apart") {
    val d = ham(AudioHash.limbs(gen(21L)).get,
      AudioHash.limbs(gen(22L)).get)
    assert(d > AudioHash.Frames / 4,
      s"unrelated fingerprints too close: $d")
  }

  test("short waveforms are rejected; constant signals tie to zero bits") {
    assert(AudioHash.limbs(Array.fill(AudioHash.MinSamples - 1)(5)).isEmpty)
    // constant signal: every energy equal, every comparison a tie ->
    // all bits 0 (ties are NOT 'greater')
    val h = AudioHash.limbs(Array.fill(AudioHash.MinSamples)(123)).get
    assert(h.toSeq === Seq(0, 0, 0, 0))
  }
}
