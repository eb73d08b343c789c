package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OrcSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  test("batch round-trip preserves unicode, newlines, and quotes") {
    import spark.implicits._
    val rows = Seq((1L, "line one\nline two"), (2L, "\"quoted\" & 中文 emoji"),
      (3L, "tab\there"))
    val dir = Files.createTempDirectory("orc").toString
    Orc.writeOrc(rows.toDF("doc_id", "text"), dir)
    val back = Orc.readOrc(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == rows.toMap)
  }

  test("q92-shape read pushes the filter and prunes to referenced columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orc_push").toString
    val docs = (1 to 500)
      .map(i => (i.toLong, s"doc $i", "en", "web", (i % 400).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Orc.writeOrc(docs, dir)
    val full = StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val q = Orc.readOrc(spark, dir, full)
      .filter(col("n_chars") >= 200)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(n_chars,200)"),
      s"ORC scan does not push the predicate:\n$scan")
    // text/doc_id/source must not decode for a (lang, n_chars) aggregate
    assert(scan.contains("ReadSchema") && !scan.contains("text:string"),
      s"ORC scan decodes unreferenced columns:\n$scan")
    // i % 400 >= 200 holds exactly for i in [200, 399]
    assert(q.collect().map(_.getLong(1)).sum == 200)
  }
}
