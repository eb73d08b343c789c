package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.TextQueries
import graft.text.TextOps._

/** Dev-only stage-by-stage timing of the near-dup pipeline. */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // usage: runMain graft.tools.DebugPerf <sfDir> one <query> — time
    // one registered query 3x in the bench's session shape
    // (SPARK_GRAFT_CPUS threads + shuffle partitions)
    if (args.length > 2 && args(1) == "one") {
      val fn = graft.SparkEntry.queries(args(2))
      (1 to 3).foreach { i =>
        // toRdd: execute as declared (count() would let Catalyst
        // prune projection work — see Bench/ScaleBench, r8)
        time(s"${args(2)} run$i")(fn(spark, dir).queryExecution.toRdd.count())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // usage: runMain graft.tools.DebugPerf <sfDir> q89sketch — time
    // q89's PRODUCTION path (bucket histogram + quantile extraction,
    // no exact witness): the decade the full query can't show because
    // its witness sort dominates
    if (args.length > 1 && args(1) == "q89sketch") {
      import graft.operators.QuantileSketch
      (1 to 3).foreach { i =>
        time(s"q89 sketch-only run$i") {
          // exactly Relational.q89 minus the exact witness — the
          // shared QuantileSketch module guarantees it stays the
          // production path as q89 evolves
          val base = spark.read.parquet(s"$dir/lineitem.parquet")
            .select(col("l_returnflag").as("flag"),
              round(col("l_extendedprice") * 100).cast("long").as("n"))
          QuantileSketch.quantiles(
              QuantileSketch.bucketHistogram(base, col("n"), Seq("flag")),
              Seq("flag"), Seq(50, 90, 99))
            .queryExecution.toRdd.count()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // usage: runMain graft.tools.DebugPerf <sfDir> rel — time the
    // relational hot spots twice (1st run = codegen + exec, 2nd = exec)
    if (args.length > 1 && args(1) == "rel") {
      Seq("q34_langid", "q39_merge_sink", "q40_cosine_topk",
        "q41_srp_buckets", "q42_ann_neardup", "q43_ivf_ann",
        "q47_dedup_clusters", "q48_bucketed_join").foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        // toRdd here too — same as-declared rule as the 'one' branch
        time(s"$name run1")(fn(spark, dir).queryExecution.toRdd.count())
        spark.catalog.clearCache()
        time(s"$name run2")(fn(spark, dir).queryExecution.toRdd.count())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // optional: flagship throughput at synthetic scale
    // usage: runMain graft.tools.DebugPerf <sfDir> <nFlights>
    if (args.length > 1) {
      import spark.implicits._
      val n = args(1).toInt
      val samples = graft.sources.FlightGen
        .trace(spark.range(n).toDF("flight"))
        .as[graft.model.FlightSample]
      val t0 = System.nanoTime()
      val rows = graft.approach.ApproachPipeline
        .detectApproaches(samples, graft.sources.Dims.syntheticAirports())
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val sps = n.toLong * graft.sources.FlightGen.SamplesPerFlight / secs
      println(f"[debug] flagship: $n%d flights (${n * 600L}%d samples) -> " +
        f"$rows%d approaches in $secs%.1f s = ${sps / 1e6}%.2f M samples/s")
      spark.stop(); return
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    time("read+count")(docs.count())
    val t = tokens(col("text"))
    time("tokenize")(docs.select(size(t)).agg(sum("size(split(lower(trim(text)), \\s+, -1))")).collect())
    val sh5 = docs.select(col("doc_id"), wordShingles(t, 5).as("sh"))
    time("shingle5")(sh5.select(sum(size(col("sh")))).collect())
    val hashed = docs.select(col("doc_id"),
      hashedShingles(t, 5).as("sh"))
    time("shingle5+hash")(hashed.select(sum(size(col("sh")))).collect())
    val inv = hashed.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s"))
    time("explode")(inv.count())
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
    time("inv-join+group")(pairs.count())
    time("q33 full")(TextQueries.q33(spark, dir).queryExecution.toRdd.count())
    time("q31 full")(TextQueries.q31(spark, dir).queryExecution.toRdd.count())
    spark.catalog.clearCache()
    // q31 internal stage split
    val near = docs.union(docs
      .filter(col("doc_id") % 7 === 0 && size(tokens(col("text"))) > 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(tokens(col("text")), lit(1),
          size(tokens(col("text"))) - 3)).as("text")))
    val sh31 = near.withColumn("sh",
      hashedShingles(tokens(col("text")), 5))
      .filter(size(col("sh")) > 0)
    val sig = sh31.select(
      (col("doc_id") +: col("sh") +: minHash(col("sh"), 8)): _*).persist()
    time("q31 sig materialize")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(lshBandKeys((0 until 8).map(i => col(s"mh$i")), 4, 2)).as("bk"))
    val idPairs = lshCandidatePairs(banded).persist()
    time("q31 band join")(idPairs.count())
    val sets = sig.select(col("doc_id"), col("sh"))
    val confirmed = idPairs
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jac", jaccard(col("sha"), col("shb")))
      .filter(col("jac") >= 0.5)
    time("q31 confirm join")(confirmed.count())
    println(TextQueries.q31(spark, dir).queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
