package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool (optimization rounds): write `.explain("formatted")` of
  * named registry queries to `<outDir>/<name>_<suffix>.txt` — the
  * before/after plan evidence committed under `plans/r<N>/`.
  * Usage: `runMain graft.tools.PlanOut <outDir> <suffix> <sfDir>
  * <query names...>`.
  */
object PlanOut {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = args(2)
    val spark = graft.GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    Files.createDirectories(Paths.get(outDir))
    for (name <- args.drop(3)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), s)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
