package graft.approach

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Airport, Runway}
import graft.sources.Dims

/** Property tests pinning the grid index to the reference's brute-force
  * semantics (FlightAnalysis.py:347-367), including the round-1 crash
  * case: query points far outside the occupied-cell bounding box.
  */
class AirportIndexSpec extends AnyFunSuite {

  private def ap(code: String, lat: Double, lon: Double) =
    Airport(code, code, "", "", lat, lon, 1000.0,
      Seq(Runway(code, "09", 90, 90, lat, lon, 1000.0)))

  test("nearest == nearestBrute on random airports and points (seeded)") {
    val rnd = new scala.util.Random(42)
    def lat() = rnd.nextDouble() * 179.8 - 89.9
    def lon() = rnd.nextDouble() * 359.8 - 179.9
    for (_ <- 1 to 200) {
      val as = Array.tabulate(1 + rnd.nextInt(40))(i => ap(f"A$i%03d", lat(), lon()))
      val idx = new AirportIndex(as)
      for (_ <- 1 to 25) {
        val (la, lo) = (lat(), lon())
        assert(idx.nearest(la, lo).code == idx.nearestBrute(la, lo).code,
          s"airports=${as.length} query=($la,$lo)")
      }
    }
  }

  test("far-from-grid points do not crash and match brute force") {
    val idx = new AirportIndex(Dims.syntheticAirports())
    for ((la, lo) <- Seq((0.0, 0.0), (-89.0, 179.0), (89.0, -179.0),
        (40.0, 100.0), (-40.0, -100.0))) {
      assert(idx.nearest(la, lo).code == idx.nearestBrute(la, lo).code)
    }
  }

  test("exact L1 ties resolve to the lowest insertion index (reference order)") {
    // two airports equidistant (L1) from the query point, in different cells
    val as = Array(ap("FIRST", 10.0, 10.0), ap("SECOND", 14.0, 14.0))
    val idx = new AirportIndex(as, cellDeg = 2.0)
    assert(idx.nearest(12.0, 12.0).code == "FIRST")
    assert(idx.nearestBrute(12.0, 12.0).code == "FIRST")
  }

  test("nearestRunway: heading gate then L1 argmin; None when no runway fits") {
    val a = Airport("X", "X", "", "", 40.0, -100.0, 800.0, Seq(
      Runway("X", "09", 90, 90, 40.0, -100.0, 800.0),
      Runway("X", "27", 270, 270, 40.0, -100.0, 800.0)))
    val idx = new AirportIndex(Array(a))
    assert(idx.nearestRunway(a, 40.0, -100.0, 92.0, 20.0).map(_.runwayCode)
      .contains("09"))
    assert(idx.nearestRunway(a, 40.0, -100.0, 268.0, 20.0).map(_.runwayCode)
      .contains("27"))
    // heading 0/180 is >20 deg from both runways
    assert(idx.nearestRunway(a, 40.0, -100.0, 0.0, 20.0).isEmpty)
    // airport with no runways at all (reference returns None)
    val bare = a.copy(runways = Seq.empty)
    assert(idx.nearestRunway(bare, 40.0, -100.0, 90.0, 20.0).isEmpty)
  }
}
