package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The measure-then-salt path (r12 verdict item 6): the q106-style
  * scout must DERIVE the salting decision, and the decided join must
  * be result-identical to the plain join — proven here on the
  * distribution salting exists for (90% of rows on one key) and on
  * the distribution it must decline (uniform).
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** 10_000 fact rows: 9_111 on key 7 (9_000 planted + the id%9==7
    * residue of the cold tail), ~111 on each other key — the
    * 90%-hot-key distribution.
    */
  private def hotFact = {
    import spark.implicits._
    spark.range(10000).select(
      when(col("id") < 9000, 7L).otherwise(col("id") % 9).as("k"),
      col("id").as("v"))
  }

  private def dim = spark.range(10).select(
    col("id").as("k"), concat(lit("d"), col("id")).as("attr"))

  test("measureSkew derives the decision from a 90%-hot-key distribution") {
    val p = Skew.measureSkew(hotFact, "k")
    assert(p.total == 10000 && p.distinctKeys == 9)
    assert(p.maxCnt == 9111)
    // floor mean = 10000/9 = 1111; ceil(9111/1111) = 9
    assert(p.salts == 9, s"expected ceil(max/mean)=9 salts, got ${p.salts}")
    assert(p.hotKeys == Seq(7L),
      s"only key 7 clears 5x the mean, got ${p.hotKeys}")
  }

  test("salted join is row-identical to the plain join on the hot distribution") {
    val p = Skew.measureSkew(hotFact, "k")
    val salted = Skew.saltedJoinFor(p, hotFact, dim, "k", col("v"))
      .select(col("k"), col("v"), col("attr"))
    val plain = hotFact.join(dim, Seq("k"))
      .select(col("k"), col("v"), col("attr"))
    assert(salted.count() == 10000)
    // exact multiset identity both directions
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's fact rows really spread over all 9 sub-keys: the
    // dim side replicated 9x for key 7, once for the cold keys
    val sd = dim.withColumn("__salt",
      explode(when(col("k").isin(p.hotKeys: _*),
        sequence(lit(0), lit(p.salts - 1)))
        .otherwise(sequence(lit(0), lit(0)))))
    assert(sd.count() == 9 + 9) // 9 cold singletons + 9 hot replicas for key 7
  }

  test("nulls in the salt source and the key survive the salted path") {
    import spark.implicits._
    val fact = Seq((7L, Some(1L)), (7L, None), (2L, Some(3L)))
      .toDF("k", "v")
    val p = Skew.SkewProfile(3, 2, 2, 4, Seq(7L))
    val salted = Skew.saltedJoinFor(p, fact, dim, "k", col("v"))
    // all three rows join (null saltSrc lands in sub-key 0, not dropped)
    assert(salted.count() == 3)
  }

  test("uniform distribution declines to salt: plain join, no salt column") {
    import spark.implicits._
    val uniform = spark.range(1000).select((col("id") % 10).as("k"),
      col("id").as("v"))
    val p = Skew.measureSkew(uniform, "k")
    assert(p.salts == 1 && p.hotKeys.isEmpty,
      s"uniform keys must not salt, got $p")
    val joined = Skew.saltedJoinFor(p, uniform, dim, "k", col("v"))
    assert(joined.count() == 1000)
    // the declined path is the genuinely plain join — no __salt
    // anywhere in the plan (the measurement said don't pay for it)
    assert(!joined.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("composed measureThenSaltJoin equals the plain join end-to-end") {
    val composed = Skew.measureThenSaltJoin(hotFact, dim, "k", col("v"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val plain = hotFact.join(dim, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(composed.exceptAll(plain).isEmpty &&
      plain.exceptAll(composed).isEmpty)
  }

  test("hot-key-only replication bounds the exchanges: one join, no extra shuffle") {
    val p = Skew.measureSkew(hotFact, "k")
    val joined = Skew.saltedJoinFor(p, hotFact, dim, "k", col("v"))
    val plan = joined.queryExecution.executedPlan.toString
    // the salted path may not introduce exchanges beyond the join's
    // own two sides (fact shuffle + dim shuffle or broadcast)
    val exchanges = "Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected <= 2 shuffle exchanges in the salted join, got $exchanges:\n$plan")
  }
}
