package graft.multimodal

/** Autocorrelation pitch detection over decoded PCM — the classic
  * time-domain fundamental-period estimator (the ACF method every
  * speech/audio curation pipeline runs before spectral work): the
  * lag L maximizing R(L) = Σᵢ s(i)·s(i+L) over a lag window is the
  * waveform's dominant period.
  *
  * Chosen over an FFT feature for the oracle story: every quantity
  * here is INTEGER arithmetic over int16 samples — R(L) is a sum of
  * bounded integer products — so the DuckDB oracle recomputes the
  * entire feature bit-exactly from the planted sample generator,
  * with no trig/FP divergence anywhere (the one division, the
  * normalized peak `nacf_e4`, folds identically in both engines).
  *
  * Overflow bound: |s| ≤ 32767 ⇒ each product ≤ 2³⁰; a Long sum is
  * safe to 2³³ terms — far past [[Codecs.MaxStatSamples]].
  *
  * Reference posture: the reference (ngafid_cpat) has no audio path;
  * §2.11 multimodal extension (SURVEY.md), DSP sibling of q129/q144's
  * decode statistics.
  */
object Acf {

  /** One decoded-and-analyzed waveform row (q146's output schema,
    * minus the normalized peak which is Column arithmetic).
    */
  final case class PitchRow(media_id: Long, n_samples: Long,
      energy: Long, best_lag: Long, r_best: Long)

  /** R(lag) = Σ_{i=0}^{n-lag-1} s(i)·s(i+lag); 0 on an empty overlap
    * (lag ≥ n) — the oracle's `coalesce(list_sum(...), 0)`.
    */
  def acfAt(s: Array[Int], lag: Int): Long = {
    var r = 0L
    var i = 0
    val end = s.length - lag
    while (i < end) { r += s(i).toLong * s(i + lag); i += 1 }
    r
  }

  /** (energy = R(0), bestLag, R(bestLag)) with bestLag the argmax of
    * R over [minLag, maxLag], ties to the SMALLEST lag (the true
    * fundamental beats its own multiples on equal correlation).
    */
  def pitch(s: Array[Int], minLag: Int, maxLag: Int): (Long, Long, Long) = {
    val energy = acfAt(s, 0)
    var bestLag = minLag
    var bestR = Long.MinValue
    var lag = minLag
    while (lag <= maxLag) {
      val r = acfAt(s, lag)
      if (r > bestR) { bestR = r; bestLag = lag }
      lag += 1
    }
    (energy, bestLag.toLong, bestR)
  }
}
