package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for shuffle joins and aggregations.
  *
  * At 100 TB a handful of hot keys (one airport, one boilerplate
  * document) can pin an entire stage on one task. AQE's skew-join
  * splitting handles sort-merge joins when enabled; this operator is
  * the explicit, planner-independent form: spread each hot fact key
  * over `salts` sub-keys and replicate the (small-side) build rows to
  * every sub-key, so the join shuffles to `salts` tasks per key.
  */
object Skew {

  /** Equi join `fact ⋈ dim` on `key`, salted: fact rows get a
    * deterministic salt from `saltSrc` (any roughly-uniform column,
    * e.g. a row id — NOT the join key), dim rows are replicated once
    * per salt. Results are identical to the plain join; only the
    * shuffle layout changes.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltSrc: Column): DataFrame = {
    // NULL saltSrc must still land in some sub-key (a null salt would
    // silently drop the row from the inner join)
    val sf = fact.withColumn("__salt",
      coalesce(pmod(saltSrc, lit(salts)), lit(0)).cast("int"))
    // generator must be top-level in the projection (no cast wrapper);
    // sequence(int, int) already yields array<int>
    val sd = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }

  /** A measured key distribution (the q106 scout, packaged): row and
    * key totals, the hottest key's count, the DERIVED salt fan-out
    * (ceil(max/mean), clamped to [1, maxSalts]), and the hot keys
    * themselves — every key at least `hotRatioX1000`/1000 x the floor
    * mean, capped at `maxHot` hottest (the cap bounds the driver-side
    * collect AND the isin literal the salted join plants; 90%-of-data
    * skew concentrates in few keys by construction, so a four-digit
    * cap is generous).
    */
  final case class SkewProfile(total: Long, distinctKeys: Long,
      maxCnt: Long, salts: Int, hotKeys: Seq[Long])

  /** Measure `fact`'s per-key distribution and derive the salting
    * decision from it — the q106 audit feeding the join instead of a
    * hand-picked constant. One map-side-combined aggregate produces
    * the per-key counts; the stats row and the (bounded) hot-key list
    * are the only driver-side materializations. Integer arithmetic
    * mirrors q106 exactly (floor mean = total DIV d; divide-first, no
    * BIGINT overflow at catalog-scale key counts), so an oracle can
    * recompute every derived number closed-form.
    */
  def measureSkew(fact: DataFrame, key: String,
      hotRatioX1000: Long = 5000, maxHot: Int = 1000,
      maxSalts: Int = 64): SkewProfile = {
    val counts = fact.select(col(key))
      .groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .persist() // stats + hot-key list are sibling consumers
    // finally-unpersist: a throw in the stats row or hot-key collect
    // (executor loss, cast failure on a non-numeric key) must not
    // leak the cached RDD in a long-lived JVM (ScaleBench decades)
    try {
      counts.count()
      val r = counts.agg(
        coalesce(sum(col("cnt")), lit(0L)).as("total"),
        count(lit(1)).as("d"),
        coalesce(max(col("cnt")), lit(0L)).as("mx")).head()
      val (total, d, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val mean = math.max(1L, total / math.max(1L, d))
      val hot = counts
        .filter(col("cnt") * 1000L >= lit(hotRatioX1000) * lit(mean))
        .orderBy(col("cnt").desc, col(key))
        .limit(maxHot)
        .select(col(key).cast("long")).collect().map(_.getLong(0)).toSeq
      val salts = math.min(maxSalts.toLong,
        math.max(1L, (mx + mean - 1) / mean)).toInt
      SkewProfile(total, d, mx, salts, hot)
    } finally counts.unpersist()
  }

  /** Equi join `fact ⋈ dim` on `key`, salted ONLY where the measured
    * profile says it pays: hot keys fan out over `profile.salts`
    * sub-keys (fact side salted from `saltSrc`, dim side replicated),
    * while cold keys keep ONE sub-key — so dim's replication factor
    * applies to |hotKeys| rows, not |dim|, and the shuffle volume
    * stays |fact| + |dim| + |hotDim|·salts instead of |dim|·salts.
    * The hot set rides the rows as a broadcast-sized isin literal —
    * map-only, no extra exchange. No hot keys (or salts == 1) means
    * the PLAIN join: measurement said salting buys nothing, so the
    * plan shouldn't pay the salt column either. Results are identical
    * to the plain join in every case (SkewJoinSpec proves it on a
    * 90%-one-key distribution).
    */
  def saltedJoinFor(profile: SkewProfile, fact: DataFrame,
      dim: DataFrame, key: String, saltSrc: Column): DataFrame = {
    if (profile.hotKeys.isEmpty || profile.salts <= 1)
      return fact.join(dim, Seq(key))
    val isHot = col(key).isin(profile.hotKeys: _*)
    val sf = fact.withColumn("__salt",
      when(isHot,
        coalesce(pmod(saltSrc, lit(profile.salts)), lit(0)).cast("int"))
        .otherwise(lit(0)))
    val sd = dim.withColumn("__salt",
      explode(when(isHot, sequence(lit(0), lit(profile.salts - 1)))
        .otherwise(sequence(lit(0), lit(0)))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }

  /** The composed measure-then-salt path: scout the fact side's key
    * distribution, then join with the decision the measurement made
    * ([[measureSkew]] -> [[saltedJoinFor]]).
    */
  def measureThenSaltJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, hotRatioX1000: Long = 5000, maxHot: Int = 1000,
      maxSalts: Int = 64): DataFrame =
    saltedJoinFor(measureSkew(fact, key, hotRatioX1000, maxHot, maxSalts),
      fact, dim, key, saltSrc)
}
