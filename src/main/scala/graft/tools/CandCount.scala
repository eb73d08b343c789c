package graft.tools

/** Dev probe: candidate-pair count of the q103 verify stage at a
  * given data dir — the denominator of its scaling law (cost per
  * CANDIDATE, not per doc; see SCALE.md round-10 decade notes).
  * Usage: runMain graft.tools.CandCount <dir> [minJaccard]
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val minJ = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // mode (arg 2): jaccard | containment | both — the q103 Jaccard
    // listing at a 100x near-copy replica is the pathological
    // dup-rate regime (the reason its 100x decade is exempted) and
    // OOMs; the containment denominator must be measurable alone
    val mode = args.lift(2).getOrElse("both")
    if (mode != "containment") {
      val docs = graft.queries.TextQueries.withNearCopiesPublic(
        graft.queries.Relational.tbl(spark, dir, "documents"))
      val n = graft.text.TextOps.jaccardPairs(docs, minJ).count()
      println(s"CANDCOUNT dir=$dir minJaccard=$minJ candidates=$n " +
        s"docs=${docs.count()}")
    }
    if (mode != "jaccard") {
      // q112's denominator: raw inverted-index candidate pairs (before
      // any confirm filter) over the excerpt fixture
      val exc = graft.queries.TextQueries.withExcerptsPublic(
        graft.queries.Relational.tbl(spark, dir, "documents"))
      val nc = graft.text.TextOps.shinglePairCounts(exc).count()
      println(s"CANDCOUNT_CONTAIN dir=$dir candidates=$nc docs=${exc.count()}")
    }
    spark.stop()
  }
}
