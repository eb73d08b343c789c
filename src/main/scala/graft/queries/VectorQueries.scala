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
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_e6
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

  // ---- q43: IVF-style ANN (coarse quantize -> probe 2 lists) ----
  // Centroids = every 31st vector (deterministic data-derived coarse
  // quantizer); each vector is assigned to its max-cosine centroid;
  // a query probes its 2 nearest centroids' lists and ranks
  // candidates by exact cosine. The inverted-list join replaces the
  // all-pairs scan — at scale, candidates/query ~ n/centroids *
  // nprobe. Scores ranked on rounded e6 ints so both engines break
  // ties identically.
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val cents = all.filter(col("vec_id") % 31 === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assign = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        round(cosine(col("v"), col("cv")) * 1e6).cast("long").as("ccos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cid"),
        round(cosine(col("qv"), col("cv")) * 1e6).cast("long").as("qcos"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("query_id"), col("qv"), col("cid"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_e6").desc, col("neighbor_id"))
    probes.join(assign, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")) * 1e6).cast("long").as("cos_e6"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q43Sql: String = {
    def cosE6(a: String, b: String) =
      s"CAST(round(1000000.0 * (${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))), 0) AS BIGINT)"
    s"""WITH e AS (
       |  SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0
       |), assign AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosE6("e.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e, cents c)
       |  WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosE6("q.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e q, cents c WHERE q.vec_id % 100 = 0)
       |  WHERE rn <= 2
       |)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_e6 FROM (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${cosE6("p.qv", "a.v")} AS cos_e6,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY ${cosE6("p.qv", "a.v")} DESC, a.vec_id) AS rank
       |  FROM probes p JOIN assign a USING (cid)
       |  WHERE a.vec_id <> p.query_id)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_topk" -> (q40 _),
    "q41_srp_buckets" -> (q41 _),
    "q42_ann_neardup" -> (q42 _),
    "q43_ivf_ann" -> (q43 _)
  )

  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" -> q40Sql,
    "q41_srp_buckets" -> q41Sql,
    "q42_ann_neardup" -> q42Sql,
    "q43_ivf_ann" -> q43Sql
  )
}
