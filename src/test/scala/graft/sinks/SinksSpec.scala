package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.approach.{AirportIndex, ApproachDetector, ApproachPipeline}
import graft.sources.{Dims, FlightGen}

/** Write-and-read-back tests of the parquet sinks, including the
  * idempotency contract (second write of the same batch leaves the
  * same rows).
  */
class SinksSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("writeApproaches: partitioned parquet, idempotent overwrite") {
    import spark.implicits._
    val out = Files.createTempDirectory("approaches").toString
    val flights = FlightGen.trace(spark.range(4).toDF("flight"))
      .as[graft.model.FlightSample]
    val approaches = ApproachPipeline.detectApproaches(
      flights, Dims.syntheticAirports())
    Sinks.writeApproaches(approaches, out)
    val firstDf = spark.read.parquet(out)
    assert(firstDf.columns.contains("flight_bucket"))
    // materialize before the overwrite invalidates the scanned files
    val firstRows = firstDf.select("flight_id", "approach_id", "landing_type")
      .collect().toSet
    assert(firstRows.size == 4)
    Sinks.writeApproaches(approaches, out) // re-run the same batch
    val secondRows = spark.read.parquet(out)
      .select("flight_id", "approach_id", "landing_type").collect().toSet
    assert(secondRows == firstRows)
  }

  test("analysisFlags: every distinct flight flagged once") {
    import spark.implicits._
    val flights = FlightGen.trace(spark.range(3).toDF("flight"))
    val flags = Sinks.analysisFlags(flights)
    val rows = flags.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Int]("approach_analysis") == 1))
  }
}
