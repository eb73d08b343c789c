package graft
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
