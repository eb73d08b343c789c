package graft.queries

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round; not part
  * of any query path. Edited freely between runs.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time(name: String, n: Int = 3)(f: => Unit): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val docs = TextQueries.withNearCopiesPublic(
      spark.read.parquet(s"$dir/documents.parquet"))
    val cand = graft.text.TextOps.jaccardPairs(docs, 0.3)
    time("q103 cand only")(cand.queryExecution.toRdd.count())
    val joined = cand
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), Seq("id_b"))
    time("q103 cand+textjoin")(joined.queryExecution.toRdd.count())
    val lev = joined.select(col("id_a"), col("id_b"),
        expr("levenshtein(ta, tb, cast((greatest(length(ta), length(tb)) div 5) as int))").cast("long").as("lev"),
        greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .filter(col("lev") =!= -1L)
    time("q103 +lev")(lev.queryExecution.toRdd.count())
    time("q103 full")(TextQueries.q103(spark, dir).queryExecution.toRdd.count())
    time("q116 full")(TextQueries.q116(spark, dir).queryExecution.toRdd.count())
    time("q107 full")(TextQueries.q107(spark, dir).queryExecution.toRdd.count())
    time("q86 full")(graft.SparkEntry.queries("q86_span_cut")(spark, dir).queryExecution.toRdd.count())
    time("q84 full")(graft.SparkEntry.queries("q84_hll_distinct")(spark, dir).queryExecution.toRdd.count())
  }
}
