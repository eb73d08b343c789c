package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Spark's runtime scale machinery must actually engage on this
  * engine's table layouts — at 100 TB these are not optimizations
  * but prerequisites:
  *
  *   - STATIC partition pruning: a literal predicate on a partition
  *     column must reach the scan as a PartitionFilter (files outside
  *     the partition are never listed into the scan);
  *   - DYNAMIC partition pruning: a join against a FILTERED dim must
  *     prune the fact's partitions at RUNTIME from the dim's build
  *     side — the standard star-schema shape where the predicate is
  *     on the dim, not the fact;
  *   - AQE skew-join splitting: the planner-side complement to the
  *     explicit `Skew.saltedEquiJoin` — a sort-merge join with one
  *     hot key must be re-planned into split sub-partitions, so the
  *     documented guidance (rely on AQE for SMJ skew, salt when the
  *     planner can't see it) rests on a verified behavior, not an
  *     assumption.
  */
class RuntimePruningSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("static + dynamic partition pruning engage on a partitioned fact") {
    import spark.implicits._
    val root = Files.createTempDirectory("dpp").toString
    // fact partitioned by region_id (the layout a date/source/tenant
    // column gets in production); 8 partitions, 200 rows each
    (0 until 1600).map(i => (i.toLong, i % 8, i * 3L))
      .toDF("id", "region_id", "amount")
      .write.partitionBy("region_id").parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")

    // static: literal partition predicate → PartitionFilters, and the
    // scan's file count drops to the one matching partition
    val one = fact.filter(col("region_id") === 3)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*region_id[^\\]]*\\].*"),
      s"partition predicate did not reach the scan:\n$scan")
    assert(one.count() == 200)

    // dynamic: the predicate lives on the DIM (DPP requires a
    // SELECTIVE dim-side filter — the star-schema shape). The dim
    // must be a FILE relation: a local Seq gets its filter
    // constant-folded into a LocalTableScan, leaving no selective
    // predicate for the pruning rule to see
    (0 until 8).map(r => (r, if (r == 3 || r == 5) "keep" else "no"))
      .toDF("region_id", "tag")
      .write.parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim")
      .filter(col("tag") === "keep")
    val joined = fact.join(dim, "region_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"dim-filtered join did not trigger dynamic partition pruning:\n$plan")
    assert(joined.count() == 400)
  }

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    // newSession: same SparkContext, ISOLATED SQLConf — suites run in
    // parallel on the shared session, and flipping broadcast/skew
    // thresholds globally would race their plan assertions
    val s = SparkSpec.spark.newSession()
    // force a sort-merge join and make the thresholds reachable at
    // test scale (defaults target multi-GB partitions)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // 95% of fact rows share key 0 (the boilerplate-document /
    // mega-airport shape); payload pads the bytes past the threshold
    val fact = s.range(0, 40000)
      .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id"))
        .as("k"), concat(lit("p" * 64), col("id")).as("payload"))
    val dim = s.range(0, 40000).select(col("id").as("k"),
      (col("id") * 7).as("w"))
    val joined = fact.join(dim, "k")
    // execute THIS Dataset's queryExecution (count() plans a separate
    // one) — the skew marking only exists in the FINAL adaptive plan
    // of the instance that ran
    val rows = joined.queryExecution.toRdd.count()
    // dim keys are unique over the fact's key range: every fact row
    // matches exactly once, skew handling must not change cardinality
    assert(rows == 40000, "unexpected join cardinality (fixture drifted)")
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$finalPlan")
  }
}
