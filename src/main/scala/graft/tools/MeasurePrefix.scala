package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness for q145's PPJoin position bound (the
  * audit-before-trust rule: the filter was adopted only after this
  * showed a real reduction). Measured on this tree: tau=7/10 organic
  * 28 -> 28 (df-ordered prefixes already tight), tau=5/10 organic
  * 863 -> 33, tau=5/10 shared-boilerplate skew (2000 docs)
  * 23,653 -> 1,485 (93.7%). PrefixJoinSpec pins the law.
  */
object MeasurePrefix {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for ((num, den) <- Seq((7, 10), (5, 10), (8, 10))) {
      val t0 = System.nanoTime()
      val noPos = graft.text.TextOps.prefixCandidateCount(docs, num, den, 3, positional = false)
      val t1 = System.nanoTime()
      val withPos = graft.text.TextOps.prefixCandidateCount(docs, num, den, 3, positional = true)
      val t2 = System.nanoTime()
      println(f"tau=$num/$den organic: noPos=$noPos (${(t1-t0)/1e9}%.1fs) withPos=$withPos (${(t2-t1)/1e9}%.1fs)")
    }
    // skewed: heavy boilerplate corpus — 2000 docs share an 8-token
    // boilerplate head, tails of wildly varying length
    val skew = (0L until 2000L).map { id =>
      val boiler = (0 until 8).map(i => s"b$i").mkString(" ")
      val tail = (0 until (3 + (id % 37)).toInt).map(j => s"t${id}_$j").mkString(" ")
      (id, boiler + " " + tail)
    }.toDF("doc_id", "text")
    for ((num, den) <- Seq((7, 10), (5, 10))) {
      val noPos = graft.text.TextOps.prefixCandidateCount(skew, num, den, 3, positional = false)
      val withPos = graft.text.TextOps.prefixCandidateCount(skew, num, den, 3, positional = true)
      println(f"tau=$num/$den skewed:  noPos=$noPos withPos=$withPos reduction=${100.0*(noPos-withPos)/math.max(noPos,1)}%.1f%%")
    }
    // r17 (verdict #6): DENSER fixtures, to decide whether PPJoin's
    // SUFFIX filter earns its complexity. (a) the sf0.01 organic
    // corpus (5x the docs); (b) a small-shared-vocabulary corpus —
    // 3000 docs whose tokens all come from a 60-token pool, so
    // prefixes collide pervasively and true Jaccard usually sits
    // under tau: the worst case for prefix-only, the best case for
    // suffix filtering. If the positional bound still collapses
    // candidates here, suffix filtering stays unadopted.
    val organic01 = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    for ((num, den) <- Seq((7, 10), (5, 10))) {
      val noPos = graft.text.TextOps.prefixCandidateCount(organic01, num, den, 3, positional = false)
      val withPos = graft.text.TextOps.prefixCandidateCount(organic01, num, den, 3, positional = true)
      println(f"tau=$num/$den organic-sf0.01: noPos=$noPos withPos=$withPos reduction=${100.0*(noPos-withPos)/math.max(noPos,1)}%.1f%%")
    }
    val dense = (0L until 3000L).map { id =>
      val toks = (0 until (14 + (id % 9)).toInt)
        .map(j => s"v${(id * 7 + j * j) % 60}")
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for ((num, den) <- Seq((7, 10), (5, 10))) {
      val noPos = graft.text.TextOps.prefixCandidateCount(dense, num, den, 3, positional = false)
      val withPos = graft.text.TextOps.prefixCandidateCount(dense, num, den, 3, positional = true)
      // candidates that VERIFY: if most candidates are true positives,
      // no filter (position, suffix, anything) can remove them —
      // verification is the irreducible cost and suffix filtering
      // would buy nothing on this shape
      val verified = graft.text.TextOps.prefixJaccardPairs(dense, num, den, 3).count()
      println(f"tau=$num/$den dense-vocab: noPos=$noPos withPos=$withPos verified=$verified reduction=${100.0*(noPos-withPos)/math.max(noPos,1)}%.1f%% spurious=${100.0*(withPos-verified)/math.max(withPos,1)}%.1f%%")
    }
    spark.stop()
  }
}
