package graft

import org.apache.spark.sql.SparkSession

/** Single-query result dump (dev tool): `runMain graft.QDump <outDir>
  * <sfDir> <query names...>` writes each named registry query's result
  * to `<outDir>/<name>` as parquet — Verify's dump for a SUBSET, so a
  * new query can be DuckDB-compared in seconds instead of re-running
  * all ~100.
  */
object QDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    for (name <- args.drop(2)) {
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
