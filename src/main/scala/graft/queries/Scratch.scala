package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.text.TextOps

/** Throwaway measurement harness for the optimization round; not part
  * of any query path. Edited freely between runs.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    def time(name: String, n: Int = 3)(f: => Unit): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // ---- q158 stage budget ----
    import graft.text.Html
    val id = col("doc_id")
    val s = (c: Column) => c.cast("string")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val near = base.filter(col("doc_id") % 7 === 0 &&
        size(split(lower(trim(col("text"))), "\\s+")) > 10)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
          lit(1), size(split(lower(trim(col("text"))), "\\s+")) - 3)).as("text"))
    val thin = base.filter(id % 97 === 0)
      .select((id + 3000000L).as("doc_id"),
        concat(lit("tiny page "), (id % 9).cast("string")).as("text"))
    val corpus = base.union(near).unionByName(thin)
    val t = regexp_replace(
      regexp_replace(coalesce(col("text"), lit("")), "[^ -~]", " "),
      "[<>&]", " ")
    val page = concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), s(id),
      lit("</title></head><body>"),
      lit("<!-- <p>tracking markup that must never leak "), s(id),
      lit("</p> -->"),
      lit("<nav><a href=\"/h\">Home</a> <a href=\"/a\">About</a></nav>"),
      lit("<DIV CLASS=\"menu > compact\">&amp; menu "), s(id % 7),
      lit("</DIV>"),
      lit("<p>"), t, lit("</p>"),
      lit("<footer><a href=\"/c\">Contact</a> (c) "), s(id % 100),
      lit("</footer></body></html>"))
    def extFrame(fan: Boolean): DataFrame = {
      val c = if (fan) graft.operators.ScanFanOut(corpus) else corpus
      c.select(id, Html.extractMain(page).getField("content").as("text"))
    }
    time("ext materialize 1-part") {
      extFrame(false).queryExecution.toRdd.count()
    }
    time("ext materialize fanned") {
      extFrame(true).queryExecution.toRdd.count()
    }
    val ext = extFrame(true).persist()
    ext.queryExecution.toRdd.count()
    val live = ext.select(col("doc_id"), col("text"))
    time("lineDedup from cache") {
      TextOps.lineDedup(TextQueries.withBoilerLines(live))
        .queryExecution.toRdd.count()
    }
    time("jaccardPairs from cache") {
      TextOps.jaccardPairs(live, 0.5).queryExecution.toRdd.count()
    }
    time("pairs+CC from cache") {
      TextOps.dedupClusters(TextOps.jaccardPairs(live, 0.5))
        .queryExecution.toRdd.count()
    }
    time("signals from cache") {
      TextOps.withLanguageId(live, col("text"), "lang_pred")
        .withColumn("quality_e4", lit(0L))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
