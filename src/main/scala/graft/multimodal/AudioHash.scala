package graft.multimodal

/** Perceptual audio fingerprint — the audio member of the near-dup
  * triad (text SimHash/MinHash, image dHash, audio THIS): a
  * chromaprint-shaped sign-of-energy-delta hash over decoded PCM.
  * The waveform is cut into 65 fixed-length frames; frame energy
  * E(k) = Σ|s(i)| is INTEGER, and bit b = [E(b+1) > E(b)] — 64 bits
  * emitted as four 16-bit limbs in [[Phash]]'s layout, so the banded
  * Hamming join machinery (limb keys, capped buckets, pigeonhole
  * exhaustiveness at hamming ≤ 3) is shared verbatim with the image
  * family.
  *
  * Why energy deltas: amplitude scaling multiplies every E(k) by the
  * same factor, preserving every comparison INCLUDING ties — so a
  * re-mastered (gain-shifted) copy fingerprints identically, the
  * analogue of dHash's brightness invariance. Local edits disturb
  * only the frames they touch (≤ 3 bits for a 2-frame splice);
  * unrelated signals differ in ~32 bits. All integer arithmetic:
  * the DuckDB oracle recomputes energies, bits, and limbs bit-exactly
  * from the planted sample generator.
  */
object AudioHash {

  val Frames = 65
  val FrameLen = 16

  /** Minimum samples a fingerprint needs. */
  val MinSamples: Int = Frames * FrameLen

  /** Four 16-bit limbs of the 64-bit energy-delta hash; None when the
    * waveform is too short to frame.
    */
  def limbs(s: Array[Int]): Option[Array[Int]] = {
    if (s.length < MinSamples) return None
    val e = new Array[Long](Frames)
    var k = 0
    while (k < Frames) {
      var acc = 0L
      var i = k * FrameLen
      val end = i + FrameLen
      while (i < end) { acc += math.abs(s(i)); i += 1 }
      e(k) = acc
      k += 1
    }
    val out = new Array[Int](4)
    var l = 0
    while (l < 4) {
      var limb = 0
      var j = 0
      while (j < 16) {
        val b = l * 16 + j
        if (e(b + 1) > e(b)) limb |= 1 << j
        j += 1
      }
      out(l) = limb
      l += 1
    }
    Some(out)
  }
}
