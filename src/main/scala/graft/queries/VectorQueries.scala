package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps._

/** Similarity-search queries over the `embeddings` table (SURVEY.md
  * §2.11): brute-force cosine top-k (correctness baseline), SRP-LSH
  * bucketing (the scale path), and LSH-bucketed cosine near-dup with
  * planted positives. Scores are reported as `round(c * 1e6)` bigints;
  * both engines compute identical doubles (sequential folds), so the
  * compare is exact.
  */
object VectorQueries {

  import Relational.tbl

  private val Planes = 8
  private val Dim = 64
  private val signs = srpSigns(Planes, Dim)

  /** The embeddings as (vec_id, v: array<double>). */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** DuckDB: double-cast list of the embedding column `e`. */
  private def vSql(e: String) =
    s"list_transform($e, x -> CAST(x AS DOUBLE))"

  /** DuckDB: sequential-fold dot product of double lists a, b. */
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  // ---- q40: brute-force cosine top-3 per query vector ----
  // Queries = every 100th vector, broadcast against the full table;
  // the fact side stays partitioned (no shuffle of the big side).
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val queries = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = all.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")) * 1e6).cast("long").as("cos_e6"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_e6").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q40Sql: String = {
    val d = dotSql("q.qv", "e.v")
    val nq = dotSql("q.qv", "q.qv")
    val ne = dotSql("e.v", "e.v")
    s"""WITH e AS (
       |  SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0
       |), scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    CAST(round(1000000.0 * ($d / (sqrt($nq) * sqrt($ne))), 0) AS BIGINT) AS cos_e6
       |  FROM e, q WHERE e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_e6,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_e6 DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cos_e6
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---- q41: SRP-LSH bucket assignment (the ANN scale path) ----
  def q41(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select(col("vec_id"), srpBucket(col("v"), signs).cast("int").as("bucket"))
      .orderBy(col("vec_id"))

  /** DuckDB literal for one hyperplane's ±1 coefficients. */
  private def planeSql(p: Int): String =
    signs(p).map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  val q41Sql: String = {
    val bits = (0 until Planes).map { p =>
      s"CASE WHEN ${dotSql("v", s"(${planeSql(p)})")} > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString(" +\n    ")
    s"""WITH e AS (
       |  SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings
       |)
       |SELECT vec_id, CAST($bits AS INT) AS bucket
       |FROM e ORDER BY vec_id""".stripMargin
  }

  // ---- q42: LSH-bucketed cosine near-dup with planted positives ----
  // Every 25th vector gets a perturbed twin (+0.05 on dim 1) at
  // vec_id + 1000000; candidates = same SRP bucket (equi join),
  // confirmed at cosine >= 0.99. Never an all-pairs join.
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val base = vecs(spark, dir)
    val planted = base.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("v"), (x, i) => when(i === 0, x + 0.05).otherwise(x))
          .as("v"))
    val all = base.union(planted)
      .withColumn("bucket", srpBucket(col("v"), signs))
    val pairs = all.as("a")
      .join(all.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")) * 1e6).cast("long").as("cos_e6"))
    pairs.filter(col("cos_e6") >= 990000L)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q42Sql: String = {
    val bits = (0 until Planes).map { p =>
      s"CASE WHEN ${dotSql("v", s"(${planeSql(p)})")} > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString(" +\n    ")
    val d = dotSql("a.v", "b.v")
    val na = dotSql("a.v", "a.v")
    val nb = dotSql("b.v", "b.v")
    s"""WITH base AS (
       |  SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings
       |), planted AS (
       |  SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(range(1, len(v) + 1),
       |      i -> CASE WHEN i = 1 THEN v[i] + 0.05 ELSE v[i] END) AS v
       |  FROM base WHERE vec_id % 25 = 0
       |), all_v AS (
       |  SELECT vec_id, v, $bits AS bucket FROM (
       |    SELECT * FROM base UNION ALL SELECT * FROM planted)
       |)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  CAST(round(1000000.0 * ($d / (sqrt($na) * sqrt($nb))), 0) AS BIGINT) AS cos_e6
       |FROM all_v a JOIN all_v b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE CAST(round(1000000.0 * ($d / (sqrt($na) * sqrt($nb))), 0) AS BIGINT) >= 990000
       |ORDER BY id_a, id_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_topk" -> (q40 _),
    "q41_srp_buckets" -> (q41 _),
    "q42_ann_neardup" -> (q42 _)
  )

  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" -> q40Sql,
    "q41_srp_buckets" -> q41Sql,
    "q42_ann_neardup" -> q42Sql
  )
}
