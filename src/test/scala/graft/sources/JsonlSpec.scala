package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class JsonlSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  test("batch round-trip preserves unicode, newlines, and quotes") {
    import spark.implicits._
    val rows = Seq((1L, "line one\nline two"), (2L, "\"quoted\" & 中文 emoji"),
      (3L, "tab\there"))
    val dir = Files.createTempDirectory("jsonl").toString
    Jsonl.writeJsonl(rows.toDF("doc_id", "text"), dir)
    val back = Jsonl.readJsonl(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == rows.toMap)
  }

  test("streaming ingest: newly landed shards become micro-batches") {
    val dir = Files.createTempDirectory("jsonl_stream").toString
    val q = Jsonl.readJsonlStream(spark, dir, schema)
      .writeStream.format("memory").queryName("jsonl_in")
      .outputMode("append").start()
    def land(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name),
        lines.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      land("shard-0.json", Seq("""{"doc_id":1,"text":"a"}"""))
      q.processAllAvailable()
      assert(spark.table("jsonl_in").count() == 1)
      land("shard-1.json", Seq("""{"doc_id":2,"text":"b"}""",
        """{"doc_id":3,"text":"c"}"""))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("jsonl_in")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }
}
