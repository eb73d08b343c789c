package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool backing the measured-shuffle table in SCALE.md: runs
  * every registered query serially under [[ShuffleMeter]] and prints
  * one markdown row per query — output rows, shuffled records,
  * shuffled bytes (written), and bytes read back. The per-query
  * budgets live in ShuffleBudgetSpec; this is the corpus-wide
  * snapshot that shows WHERE the engine's shuffle volume actually
  * goes (and that most queries shuffle orders of magnitude less than
  * they scan).
  *
  * Usage: runMain graft.tools.ShuffleReport [sfDir]
  */
object ShuffleReport {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    println("| query | rows out | shuffle records | shuffle MB | read-back MB |")
    println("|---|---|---|---|---|")
    var totW = 0L; var totB = 0L
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      var rows = 0L
      // toRdd, NOT count(): the count rewrite lets Catalyst prune any
      // operator that doesn't change cardinality (q53's as-of window
      // vanishes entirely) — toRdd executes the plan as declared
      val s = ShuffleMeter.measure(spark) {
        rows = q(spark, dir).queryExecution.toRdd.count()
      }
      // this session is exclusive to the report, so any untagged job
      // in the window is one of the query's own jobs that escaped
      // job-group attribution — the numbers would undercount
      require(s.untaggedConcurrentJobs == 0,
        s"$name: ${s.untaggedConcurrentJobs} jobs ran in the window " +
          "without the meter tag — attribution gap, numbers not trustworthy")
      spark.catalog.clearCache()
      totW += s.writeRecords; totB += s.writeBytes
      println(f"| $name | $rows | ${s.writeRecords} | " +
        f"${s.writeBytes / 1e6}%.2f | ${s.readBytes / 1e6}%.2f |")
    }
    println(f"| TOTAL |  | $totW | ${totB / 1e6}%.2f |  |")
    spark.stop()
  }
}
