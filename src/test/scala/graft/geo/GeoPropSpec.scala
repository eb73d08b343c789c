package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the scalar geodesy twins (SURVEY.md §5.2),
  * driven by a seeded generator (deterministic across runs).
  */
class GeoPropSpec extends AnyFunSuite {

  private val N = 500

  private def cases(seed: Long): Seq[(Double, Double, Double, Double, Double, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(N)((
      rnd.between(-89.0, 89.0), rnd.between(-179.0, 179.0),
      rnd.between(-89.0, 89.0), rnd.between(-179.0, 179.0),
      rnd.between(-89.0, 89.0), rnd.between(-179.0, 179.0),
      rnd.between(0.0, 360.0)
    ))
  }

  test("headingDifference is in [0,180], symmetric, zero iff equal") {
    cases(1).foreach { case (_, _, _, _, _, _, h1) =>
      val h2 = (h1 * 7.3) % 360
      val d = GeoS.headingDifference(h1, h2)
      assert(d >= 0 && d <= 180 + 1e-9)
      assert(math.abs(d - GeoS.headingDifference(h2, h1)) < 1e-9)
      assert(math.abs(GeoS.headingDifference(h1, h1)) < 1e-9)
    }
  }

  test("distance is symmetric, non-negative, zero to self") {
    cases(2).foreach { case (a, b, c, d, _, _, _) =>
      val d1 = GeoS.distanceTo(a, b, c, d, 3959.0)
      val d2 = GeoS.distanceTo(c, d, a, b, 3959.0)
      assert(d1 >= 0)
      assert(math.abs(d1 - d2) < 1e-6)
      assert(GeoS.distanceTo(a, b, a, b, 3959.0) < 1e-9)
    }
  }

  test("distance satisfies the triangle inequality") {
    cases(3).foreach { case (a, b, c, d, e, f, _) =>
      val ab = GeoS.distanceTo(a, b, c, d, 1.0)
      val bc = GeoS.distanceTo(c, d, e, f, 1.0)
      val ac = GeoS.distanceTo(a, b, e, f, 1.0)
      assert(ac <= ab + bc + 1e-9)
    }
  }

  test("toVector . toLatLon round-trips and is unit length") {
    cases(4).foreach { case (lat, lon, _, _, _, _, _) =>
      val v = GeoS.toVector(lat, lon)
      assert(math.abs(v.length - 1.0) < 1e-12)
      val (lat2, lon2) = v.toLatLon
      assert(math.abs(lat - lat2) < 1e-9)
      assert(math.abs(lon - lon2) < 1e-9)
    }
  }

  test("crossTrack sign flips with side of path") {
    // path heading due east from (0,0): north of path is left (-),
    // south is right (+)
    cases(5).foreach { case (_, _, _, _, _, _, h) =>
      val off = 0.01 + (h / 360.0) * 5.0
      val north = GeoS.crossTrackDistanceTo(off, 0.5, 0, 0, 90.0, 6371000)
      val south = GeoS.crossTrackDistanceTo(-off, 0.5, 0, 0, 90.0, 6371000)
      assert(north < 0)
      assert(south > 0)
    }
  }

  test("destinationPoint travels the requested distance") {
    cases(6).foreach { case (lat, lon, _, _, _, _, brg) =>
      val dist = 1000.0 + brg * 5000.0
      val (lat2, lon2) = GeoS.destinationPoint(lat, lon, dist, brg, 6371000)
      val back = GeoS.distanceTo(lat, lon, lat2, lon2, 6371000)
      assert(math.abs(back - dist) < 1.0)
    }
  }

  test("bearingTo is in [0,360)") {
    cases(7).foreach { case (a, b, c, d, _, _, _) =>
      val brg = GeoS.bearingTo(a, b, c, d)
      assert(brg >= 0 && brg < 360)
    }
  }
}
