package graft.tools

import org.apache.spark.sql.SparkSession

import graft.approach.ApproachPipeline
import graft.model.FlightSample
import graft.sources.{Dims, FlightGen}

/** Dev-only: dump the approaches table for synthetic flights 0..n-1
  * (default 624 = 2 x lcm(3, 8, 13), covering every (flavor, airport,
  * violation) combination twice) — used to derive/validate the q20
  * closed-form oracle constants across the full mod domain.
  */
object DumpGolden {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/golden_approaches")
    val n = if (args.length > 1) args(1).toInt else 624
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val samples = FlightGen.trace(spark.range(n).toDF("flight"))
      .as[FlightSample]
    ApproachPipeline.approachesTable(
      ApproachPipeline.detectApproaches(samples, Dims.syntheticAirports()))
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
