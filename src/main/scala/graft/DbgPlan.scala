package graft

/** Single-query plan dump (dev tool): `runMain graft.DbgPlan <query
  * name>` prints the executed plan at sf0.001 — for eyeballing one
  * query's plan while iterating, without running DumpPlans over the
  * whole picks list.
  */
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    val cap = sys.env.get("GRAFT_DBG_PLAN_CHARS").map(_.toInt)
      .getOrElse(4000)
    println(df.queryExecution.executedPlan.toString.take(cap))
    spark.stop()
  }
}
