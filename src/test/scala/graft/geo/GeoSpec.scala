package graft.geo

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Golden-value tests for the geodesy library, against the worked
  * examples published in the reference's docstrings (LatLon.py:57-59,
  * 81-82,104-106,127-129,153-155,176-177,206-212,253-254) — values
  * originally from Veness's latlon-vectors library.
  */
class GeoSpec extends AnyFunSuite {

  test("Geo.formatLatLon: 6-decimal '(lat, lon)' form (G14)") {
    import SparkSpec.spark.implicits._
    val got = Seq((12.25, -59.5)).toDF("lat", "lon")
      .select(Geo.formatLatLon(col("lat"), col("lon")))
      .collect().head.getString(0)
    assert(got == "(12.250000, -59.500000)")
  }

  // ---- scalar twins (GeoS) ----

  test("GeoS.toVector (45,45) = [0.5, 0.5, 0.7071]") {
    val v = GeoS.toVector(45, 45)
    assert(math.abs(v.x - 0.5) < 1e-4)
    assert(math.abs(v.y - 0.5) < 1e-4)
    assert(math.abs(v.z - 0.7071) < 1e-4)
  }

  test("GeoS vector round-trip toVector . toLatLon = id") {
    val (lat, lon) = GeoS.toVector(44.5, -99.25).toLatLon
    assert(math.abs(lat - 44.5) < 1e-9)
    assert(math.abs(lon - -99.25) < 1e-9)
  }

  test("GeoS.distanceTo London->Paris = 404.3 km") {
    val d = GeoS.distanceTo(52.205, 0.119, 48.857, 2.351, 6371000)
    assert(math.abs(d / 1000 - 404.3) < 0.05)
  }

  test("GeoS.bearingTo London->Paris = 156.2 deg") {
    val b = GeoS.bearingTo(52.205, 0.119, 48.857, 2.351)
    assert(math.abs(b - 156.2) < 0.05)
  }

  test("GeoS.midpointTo = 50.5363N, 1.2746E") {
    val (lat, lon) = GeoS.midpointTo(52.205, 0.119, 48.857, 2.351)
    assert(math.abs(lat - 50.5363) < 1e-3)
    assert(math.abs(lon - 1.2746) < 1e-3)
  }

  test("GeoS.destinationPoint 7794 m @ 300.7 = 51.5135N, 0.0983W") {
    val (lat, lon) = GeoS.destinationPoint(51.4778, -0.0015, 7794, 300.7, 6371000)
    assert(math.abs(lat - 51.5135) < 1e-3)
    assert(math.abs(lon - -0.0983) < 1e-3)
  }

  test("GeoS.greatCircle (53.3206,-1.7297)@96.0 = [-0.794,0.129,0.594]") {
    val gc = GeoS.greatCircle(53.3206, -1.7297, 96.0)
    assert(math.abs(gc.x - -0.794) < 1e-3)
    assert(math.abs(gc.y - 0.129) < 1e-3)
    assert(math.abs(gc.z - 0.594) < 1e-3)
  }

  test("GeoS.crossTrackDistanceTo bearing form = -305.7 m") {
    val d = GeoS.crossTrackDistanceTo(53.2611, -0.7972, 53.3206, -1.7297, 96.0, 6371000)
    assert(math.abs(d - -305.7) < 0.5)
  }

  test("GeoS.crossTrackDistanceToPath two-point form = -307.5 m") {
    val d = GeoS.crossTrackDistanceToPath(
      53.2611, -0.7972, 53.3206, -1.7297, 53.1887, 0.1334, 6371000)
    assert(math.abs(d - -307.5) < 0.5)
  }

  test("GeoS.headingDifference basics") {
    assert(GeoS.headingDifference(350, 10) == 20)
    assert(GeoS.headingDifference(90, 270) == 180)
    assert(GeoS.headingDifference(45, 45) == 0)
  }

  // ---- Column combinators agree with scalar twins bit-for-bit ----

  test("Column geodesy matches GeoS on a grid of points") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val pts = for {
      lat1 <- Seq(-60.0, -10.5, 0.0, 40.25, 89.0)
      lon1 <- Seq(-170.0, -0.25, 13.75, 179.0)
    } yield (lat1, lon1, lat1 / 2 + 1.5, lon1 / 3 - 2.25)
    val df = pts.toDF("lat1", "lon1", "lat2", "lon2")
    val got = df
      .select(
        $"lat1", $"lon1", $"lat2", $"lon2",
        Geo.distanceTo($"lat1", $"lon1", $"lat2", $"lon2", lit(3959.0)).as("dist"),
        Geo.bearingTo($"lat1", $"lon1", $"lat2", $"lon2").as("brg"),
        Geo.crossTrackDistanceTo($"lat1", $"lon1", $"lat2", $"lon2", lit(96.0), lit(20900000.0)).as("xtk"),
        Geo.headingDifference($"lat1" + 200, $"lon2" + 170).as("hd")
      )
      .collect()
    got.foreach { case Row(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
        dist: Double, brg: Double, xtk: Double, hd: Double) =>
      assert(dist == GeoS.distanceTo(lat1, lon1, lat2, lon2, 3959.0))
      assert(math.abs(brg - GeoS.bearingTo(lat1, lon1, lat2, lon2)) < 1e-9)
      assert(xtk == GeoS.crossTrackDistanceTo(lat1, lon1, lat2, lon2, 96.0, 20900000.0))
      assert(hd == GeoS.headingDifference(lat1 + 200, lon2 + 170))
    }
  }
}
