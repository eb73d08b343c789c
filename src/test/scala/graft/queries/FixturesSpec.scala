package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The planted-id overflow guard must actually FIRE — the loud-
  * failure contract FIXTURES.md advertises for scaled replicas that
  * outgrow a fixture offset. The guard's only job is inputs no gate
  * run ever produces, so without this negative test a Catalyst rule
  * change or refactor could silently optimize the assert away and
  * nobody would notice until planted and organic ids merged again.
  */
class FixturesSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("plantedId offsets ids below the offset") {
    import spark.implicits._
    val out = Seq(0L, 7L, 999999L).toDF("id")
      .select(Fixtures.plantedId(col("id"), 1000000L).as("pid"))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1000000L, 1000007L, 1999999L))
  }

  test("plantedId fails LOUDLY when the organic id space reaches the offset") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1000000L).toDF("id")
        .select(Fixtures.plantedId(col("id"), 1000000L))
        .collect()
    }
    val msg = String.valueOf(e.getMessage) + String.valueOf(e.getCause)
    assert(msg.contains("planted-fixture offset") ||
      e.toString.contains("planted-fixture offset"),
      s"guard fired but without its named-offset context: $e")
  }

  test("plantedId rejects negative ids too") {
    import spark.implicits._
    intercept[Exception] {
      Seq(-1L).toDF("id")
        .select(Fixtures.plantedId(col("id"), 1000000L)).collect()
    }
  }
}
