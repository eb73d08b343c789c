package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q90 (unigram LM log-prob) and q91 (bigram PMI) against independent
  * driver-side reference implementations at sf0.001 — the whole
  * pipeline (tokenize, count, smooth, ln-round, integer fold, rank)
  * recomputed in plain Scala collections and compared row-for-row —
  * plus the plan shapes the 100 TB posture depends on.
  */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  // Spark's split(lower(trim(text)), "\\s+") twin: trim first, so no
  // leading/trailing empty tokens; Java split then agrees with -1 limit
  private lazy val docToks: Map[Long, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
      .toMap

  test("q90 matches a driver-side reference fold, row for row") {
    val counts = docToks.values.flatten
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = counts.values.sum
    val v = counts.size.toLong
    val lnZ = math.round(math.log((n + v).toDouble) * 1e6)
    val ll = counts.map { case (t, c) =>
      t -> math.round(math.log((c + 1).toDouble) * 1e6)
    }
    val expected = docToks.map { case (id, ts) =>
      val sum = ts.map(ll).sum
      id -> (ts.size.toLong, sum, sum / ts.size - lnZ)
    }
    val got = TextQueries.q90(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("q91 matches a driver-side reference PMI ranking, row for row") {
    val bigrams = docToks.values.toSeq.filter(_.size >= 2)
      .flatMap(ts => ts.zip(ts.tail))
    val nBi = bigrams.size.toDouble
    val cxy = bigrams.groupBy(identity)
      .map { case (p, o) => p -> o.size.toLong }
    val cx = bigrams.groupBy(_._1).map { case (x, o) => x -> o.size.toLong }
    val cy = bigrams.groupBy(_._2).map { case (y, o) => y -> o.size.toLong }
    val expected = cxy.toSeq
      .filter(_._2 >= 5)
      .map { case ((x, y), c) =>
        val pmi = math.round((math.log(c.toDouble) + math.log(nBi)
          - math.log(cx(x).toDouble) - math.log(cy(y).toDouble)) * 1e6)
        (x, y, c, cx(x), cy(y), pmi)
      }
      .sortBy { case (x, y, _, _, _, pmi) => (-pmi, x, y) }
      .take(100)
    val got = TextQueries.q91(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("q90 vocab probe is a broadcast hash join, never a shuffled one") {
    val p = TextQueries.q90(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"q90 probe not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q90 shuffles the token stream:\n$p")
  }

  test("q91 hands the driver 100 rows via a bounded top-k, no cartesian") {
    val p = TextQueries.q91(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"q91 sorts globally:\n$p")
    assert(!p.contains("CartesianProduct"), s"q91 goes all-pairs:\n$p")
  }
}
