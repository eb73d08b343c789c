package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchPolicy]] — the contention-refusal rules Bench applies,
  * pinned so the r16 failure mode (per-query >2x outliers shipping
  * silently inside a "quiet" capture) cannot re-open.
  */
class BenchPolicySpec extends AnyFunSuite {

  test("ratioMedian: empty, odd, even") {
    assert(BenchPolicy.ratioMedian(Nil) == -1.0)
    assert(BenchPolicy.ratioMedian(Seq(1.5)) == 1.5)
    assert(BenchPolicy.ratioMedian(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchPolicy.ratioMedian(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
  }

  test("isSuspect: the r16 outliers now trip; jitter doesn't") {
    // BENCH_r16's silent outliers — both must be suspects at 2x
    assert(BenchPolicy.isSuspect(5.62, 5.62 / 2.35), "q39 at 2.35x")
    assert(BenchPolicy.isSuspect(3.29, 3.29 / 2.17), "q105 at 2.17x")
    // at/below the ratio line: not a suspect
    assert(!BenchPolicy.isSuspect(1.9, 1.0))
    assert(!BenchPolicy.isSuspect(2.0, 1.0), "boundary is exclusive")
    // sub-second floor at a big ratio but tiny absolute excess:
    // the 0.3 s guard keeps scheduler jitter off the re-run budget
    assert(!BenchPolicy.isSuspect(0.25, 0.1), "2.5x but +0.15 s only")
    assert(BenchPolicy.isSuspect(0.45, 0.1), "2.5x band, +0.35 s")
    // no floor -> never a suspect
    assert(!BenchPolicy.isSuspect(10.0, 0.0))
    assert(!BenchPolicy.isSuspect(10.0, -1.0))
  }

  test("suspects: worst ratio first, name-tiebroken, floorless skipped") {
    val best = Map("qa" -> 4.0, "qb" -> 9.0, "qc" -> 1.0,
      "qd" -> 6.0, "qe" -> 50.0)
    val expect = Map("qa" -> 1.0, "qb" -> 3.0, "qc" -> 1.0, "qd" -> 2.0)
    // qa 4x, qb 3x, qc 1x (clean), qd 3x (ties qb -> name order),
    // qe has no floor
    assert(BenchPolicy.suspects(best, expect) == Seq("qa", "qb", "qd"))
    assert(BenchPolicy.suspects(Map.empty, expect).isEmpty)
    assert(BenchPolicy.suspects(best, Map.empty).isEmpty)
  }
}
