package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Acf]] — autocorrelation pitch detection (q146) — and the
  * [[Codecs.decodeWavSamples]] seam that feeds it.
  */
class AcfSpec extends AnyFunSuite {

  test("acfAt matches the definition on a hand signal") {
    val s = Array(1, -2, 3, -4)
    assert(Acf.acfAt(s, 0) === (1 + 4 + 9 + 16).toLong)
    assert(Acf.acfAt(s, 1) === (1 * -2 + -2 * 3 + 3 * -4).toLong)
    assert(Acf.acfAt(s, 3) === (1 * -4).toLong)
    assert(Acf.acfAt(s, 4) === 0L, "empty overlap is 0")
    assert(Acf.acfAt(s, 9) === 0L, "lag past n is 0")
  }

  test("pitch finds the planted period of a tiled waveform") {
    val p = 17
    val base = Array.tabulate(p)(j => ((j * 101 + 37) % 4001) - 2000)
    val s = Array.tabulate(400)(i => base(i % p))
    val (energy, lag, r) = Acf.pitch(s, 2, 64)
    assert(lag === p.toLong, s"expected period $p, got $lag")
    assert(energy > 0L && r > 0L && r <= energy)
  }

  test("ties break to the smallest lag (fundamental beats multiples)") {
    // constant signal: R(L) = (n-L)·c² strictly decreases with L, so
    // build an exact tie instead: zeros everywhere -> all R(L) = 0
    val s = Array.fill(50)(0)
    val (_, lag, r) = Acf.pitch(s, 2, 64)
    assert(lag === 2L && r === 0L)
  }

  test("WAV sample round-trip: encode -> decodeWavSamples is identity") {
    val n = 137
    val gen = (i: Int) => ((i * 131) % 4097) - 2048
    val wav = Codecs.encodeWav(8000, n, gen)
    val (rate, smp) = Codecs.decodeWavSamples(wav).get
    assert(rate === 8000)
    assert(smp.toSeq === (0 until n).map(gen))
  }

  test("decodeWavSamples rejects malformed payloads") {
    assert(Codecs.decodeWavSamples("nope".getBytes).isEmpty)
    assert(Codecs.decodeWavSamples(Array.empty[Byte]).isEmpty)
    // stats path still agrees with the samples path on a good payload
    val wav = Codecs.encodeWav(8000, 64, i => i - 32)
    val stats = Codecs.decodeWav(wav).get
    val (_, smp) = Codecs.decodeWavSamples(wav).get
    assert(stats.nSamples === smp.length)
    assert(stats.sumAbs === smp.map(s => math.abs(s).toLong).sum)
  }
}
