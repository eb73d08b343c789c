package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed candidate-pair generation shared by the near-dup
  * pipelines (text LSH bands, vector SRP buckets): a self equi join
  * on a bucket key, guarded by a hot-bucket cap.
  *
  * 100 TB posture: candidate pairs grow as sum(bucket_size^2) — one
  * adversarial bucket (boilerplate docs, a degenerate embedding
  * region) makes the join quadratic. Buckets holding more than
  * `maxBucket` rows are dropped BEFORE pairing, bounding pair count
  * by n_buckets * maxBucket^2. Recall-lossy, precision-safe: dropped
  * buckets lose candidates only; any exact confirm stage downstream
  * is unaffected. The cap costs one aggregate over bucket keys with
  * map-side partial counts (the hot set is at most n/maxBucket keys —
  * tiny by definition — so it broadcasts) plus a broadcast anti join;
  * the input table itself is never shuffled for the cap.
  */
object Buckets {

  /** Candidate pairs from a bucketed self-join of `all`, which must
    * carry `idCol` and `bucketCol`; any other columns ride along.
    * Returns the joined frame with `a`/`b` aliases, one row per
    * within-bucket pair with `a.idCol < b.idCol` — select
    * `col("a.x")`/`col("b.x")` downstream. Callers pairing a table
    * derived lazily should persist + eagerly materialize it first:
    * the two join sides are sibling stages of one job and race to
    * compute uncached partitions.
    */
  def cappedSelfJoinPairs(all: DataFrame, idCol: String,
      bucketCol: String, maxBucket: Long): DataFrame = {
    val hot = all.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucket).select(col(bucketCol))
    val small = all.join(broadcast(hot), Seq(bucketCol), "left_anti")
    small.as("a")
      .join(small.as("b"),
        col(s"a.$bucketCol") === col(s"b.$bucketCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
  }

  /** The bipartite sibling: candidate pairs from an equi join of two
    * DISTINCT bucketed tables (e.g. the source/target sides of
    * alignment mining), with the same hot-bucket guard — a key whose
    * population exceeds `maxBucket` on EITHER side is dropped before
    * pairing, bounding pair count by n_buckets * maxBucket^2. Returns
    * the `a`(left)/`b`(right)-aliased join; callers should persist +
    * eagerly materialize lazily-derived inputs (sibling-stage race,
    * as with [[cappedSelfJoinPairs]]).
    */
  def cappedBipartitePairs(left: DataFrame, right: DataFrame,
      bucketCol: String, maxBucket: Long): DataFrame = {
    def hot(df: DataFrame) =
      df.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") > maxBucket).select(col(bucketCol))
    val hotKeys = hot(left).union(hot(right)).distinct()
    val l = left.join(broadcast(hotKeys), Seq(bucketCol), "left_anti")
    val r = right.join(broadcast(hotKeys), Seq(bucketCol), "left_anti")
    l.as("a").join(r.as("b"),
      col(s"a.$bucketCol") === col(s"b.$bucketCol"))
  }
}
