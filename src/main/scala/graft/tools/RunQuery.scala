package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run a named subset of SparkEntry.queries against a
  * testdata dir and write each result to outDir/<name>.parquet —
  * a targeted slice of what Verify does for the whole inventory,
  * for iterating on one query without paying the full gate.
  *
  * Usage: runMain graft.tools.RunQuery <sfDir> <outDir> <q1> [q2 ...]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[runquery] wrote $outDir/$name")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
