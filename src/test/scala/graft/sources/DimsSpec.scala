package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Validates the dimension loaders against the reference's real CSVs
  * (/root/reference/data, read-only): row counts, the positional
  * column mapping (main.py:163-183), and the corrected elevation
  * column (index 8, not the reference's buggy index 6 — SURVEY §1.3).
  */
class DimsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/reference/data"

  private lazy val airports = Dims.loadAirportsCsv(spark, s"$dir/Airports.csv")
  private lazy val runways = Dims.loadRunwaysCsv(spark, s"$dir/AirportsDetailed.csv")

  test("Airports.csv: 15,165 rows with the documented schema") {
    assert(airports.count() == 15165)
    val first = airports.orderBy("code").filter(airports("code") === "00A")
      .collect().head
    assert(first.getAs[String]("name") == "STONE MOUNTAIN-BRITT MEMORIAL")
    assert(first.getAs[String]("state") == "GA")
    assert(math.abs(first.getAs[Double]("latitude") - 33.811667) < 1e-9)
    assert(math.abs(first.getAs[Double]("longitude") - -84.12) < 1e-9)
    assert(first.getAs[Double]("elevation_ft") == 986.0)
  }

  test("AirportsDetailed.csv: 164 runway rows, correct positional mapping") {
    assert(runways.count() == 164)
    val gfk35L = runways
      .filter(runways("airportCode") === "GFK" && runways("runwayCode") === "35L")
      .collect().head
    assert(gfk35L.getAs[Double]("magHeading") == 354.0)
    assert(gfk35L.getAs[Double]("trueHeading") == 360.0)
    assert(math.abs(gfk35L.getAs[Double]("lat") - 47.9491695) < 1e-9)
    assert(math.abs(gfk35L.getAs[Double]("lon") - -97.18123025) < 1e-9)
    // index 8 = Elevation_FT (the reference wrongly reads 6 = Latitude)
    assert(gfk35L.getAs[Double]("elevationFt") == 845.0)
  }

  test("airportsWithRunways: nested association, empty list when none") {
    import spark.implicits._
    val dim = Dims.airportsWithRunways(airports, runways)
    assert(dim.count() == 15165)
    val withRwys = dim.filter(org.apache.spark.sql.functions.size($"runways") > 0)
    // 164 runway rows across the distinct airports present in the file
    val distinctCodes = runways.select("airportCode").distinct().count()
    assert(withRwys.count() == distinctCodes)
    val gfk = dim.filter($"code" === "GFK").as[graft.model.Airport].collect().head
    assert(gfk.runways.nonEmpty)
    assert(gfk.runways.forall(_.airportCode == "GFK"))
    val bare = dim.filter($"code" === "00A").as[graft.model.Airport].collect().head
    assert(bare.runways.isEmpty) // never null (reference builds [])
  }

  test("referenceAirports: full collected dimension usable by the index") {
    val as = Dims.referenceAirports(spark)
    assert(as.length == 15165)
    val idx = new graft.approach.AirportIndex(as)
    // Grand Forks Intl is the nearest airport to its own coordinates
    assert(idx.nearest(47.9493, -97.1761).code == "GFK")
  }
}
