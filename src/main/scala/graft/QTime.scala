package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe (dev tool): `runMain graft.QTime <query
  * names...>` times each named registry query 3x at sf0.1 in a fresh
  * `local[32]` JVM — for distinguishing a code regression from the
  * box's documented contention swings (SCALE.md "Measurement
  * hygiene") without paying a full bench pass.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // toRdd warm-up and timing — the as-declared semantics Bench and
    // ScaleBench use since r8; a count() here timed the count-rewrite
    // plan instead (pruned projections/sorts), so QTime's numbers
    // were not comparable to the bench they exist to cross-check
    SparkEntry.queries("q12_topk")(spark, sfDir)
      .queryExecution.toRdd.count() // JIT warm-up
    for (name <- args; pass <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // teardown outside the timed window
      println(f"TIMED $name pass$pass $secs%.2f s")
    }
    spark.stop()
  }
}
