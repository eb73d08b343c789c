package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sinks.JdbcUpsert

/** JDBC source + upsert sink against embedded Derby (the in-container
  * stand-in for the reference's MySQL boundary, main.py:22-37 /
  * FlightAnalysis.py:400-437). In-memory DB, one per suite run.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def exec(sql: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      sql.foreach(st.execute)
      st.close()
    } finally c.close()
  }

  private def dropIfExists(table: String): Unit =
    try exec(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () }

  test("source read pushes the work-list predicate into the database") {
    dropIfExists("flight_analyses")
    exec(
      "CREATE TABLE flight_analyses (flight_id BIGINT PRIMARY KEY, " +
        "approach_analysis INT NOT NULL)",
      (0 until 50).map(i => s"($i, ${i % 3 min 1})")
        .mkString("INSERT INTO flight_analyses VALUES ", ", ", ""))
    // the reference's S1 scan: SELECT flight_id FROM flight_analyses
    // WHERE approach_analysis = 0  (main.py:27)
    val pending = Jdbc.read(spark, url, "flight_analyses")
      .filter(col("APPROACH_ANALYSIS") === 0)
      .select(col("FLIGHT_ID").as("flight_id"))
    val plan = pending.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toUpperCase.contains("EQUALTO(APPROACH_ANALYSIS,0)"),
      s"work-list predicate not pushed to the database:\n$plan")
    assert(pending.collect().map(_.getLong(0)).sorted.toSeq ===
      (0 until 50 by 3).map(_.toLong))
  }

  test("partitioned read slices the table without losing rows") {
    val df = Jdbc.readPartitioned(spark, url, "flight_analyses",
      "flight_id", 0L, 50L, 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 50)
    assert(df.select(sum(col("FLIGHT_ID"))).head.getLong(0) === (0 until 50).sum)
  }

  test("stride partitioning under key skew: slice loads measured, surrogate re-key balances") {
    dropIfExists("skewed_j")
    // deliberately skewed work list: 90% of rows live in the first
    // 1/8th of the key range (hot tenant / legacy-id block — the
    // shape that breaks naive JDBC fan-out), the rest thin out to 800
    exec("CREATE TABLE skewed_j (id BIGINT PRIMARY KEY, k BIGINT)" +:
      (0 until 1000).grouped(100).map(g =>
        g.map { i =>
          val k = if (i < 900) i % 100 else 100 + (i - 900) * 7
          s"($i, $k)"
        }.mkString("INSERT INTO skewed_j VALUES ", ", ", "")).toSeq: _*)
    def sliceCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2).toSeq
    // stride on the NATURAL key: uniform [lo,hi) predicates, so the
    // hot block lands on one connection — measured, not assumed
    val natural = sliceCounts(
      Jdbc.readPartitioned(spark, url, "skewed_j", "k", 0L, 800L, 8))
    assert(natural.sum === 1000L, "stride predicates lost rows")
    assert(natural.head === 900L,
      s"expected the hot block concentrated in slice 0, got $natural")
    // the DEPLOY.md mitigation: stride on a DENSE SURROGATE (ROW_NUMBER
    // materialized at export time, or the PK when it is dense) — same
    // rows, every connection pulls an equal slice
    val surrogate = sliceCounts(
      Jdbc.readPartitioned(spark, url, "skewed_j", "id", 0L, 1000L, 8))
    assert(surrogate.sum === 1000L)
    assert(surrogate.forall(_ === 125L),
      s"dense-surrogate stride should balance exactly, got $surrogate")
  }

  test("upsert inserts, updates, and converges idempotently") {
    import spark.implicits._
    dropIfExists("approaches_j")
    exec("CREATE TABLE approaches_j (flight_id BIGINT, approach_id INT, " +
      "airport VARCHAR(8), score DOUBLE, " +
      "PRIMARY KEY (flight_id, approach_id))")
    def state(): Map[(Long, Int), (String, Double)] =
      Jdbc.read(spark, url, "approaches_j").collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getString(2), r.getDouble(3))).toMap

    // batchSize 7 forces several chunks per partition
    val first = (0 until 40).map(i => (i.toLong % 10, i / 10, s"AP$i", i * 0.5))
      .toDF("flight_id", "approach_id", "airport", "score").repartition(3)
    JdbcUpsert.upsert(first, url, "approaches_j",
      Seq("flight_id", "approach_id"), batchSize = 7)
    assert(state().size === 40)
    assert(state()((3L, 2)) === ("AP23", 11.5))

    // second batch: 20 overlapping keys with new payloads + 5 new keys
    val second = ((0 until 20).map(i =>
        (i.toLong % 10, i / 10, "UPD", 99.0)) ++
      (0 until 5).map(i => (100L + i, 0, "NEW", 1.0)))
      .toDF("flight_id", "approach_id", "airport", "score").repartition(3)
    JdbcUpsert.upsert(second, url, "approaches_j",
      Seq("flight_id", "approach_id"), batchSize = 7)
    val s2 = state()
    assert(s2.size === 45)
    assert(s2((3L, 0)) === ("UPD", 99.0))   // updated
    assert(s2((3L, 2)) === ("AP23", 11.5))  // untouched survivor
    assert(s2((102L, 0)) === ("NEW", 1.0))  // inserted

    // replay = task retry: same mapping, same converged state
    JdbcUpsert.upsert(second, url, "approaches_j",
      Seq("flight_id", "approach_id"), batchSize = 7)
    assert(state() === s2)
  }

  test("upsert binds NULLs and timestamps") {
    import spark.implicits._
    dropIfExists("typed_j")
    exec("CREATE TABLE typed_j (id BIGINT PRIMARY KEY, label VARCHAR(16), " +
      "seen TIMESTAMP, flag BOOLEAN)")
    val df = Seq(
      (1L, Some("a"), Some(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
        Some(true)),
      (2L, None: Option[String], None: Option[java.sql.Timestamp],
        None: Option[Boolean]))
      .toDF("id", "label", "seen", "flag")
    JdbcUpsert.upsert(df, url, "typed_j", Seq("id"))
    val rows = Jdbc.read(spark, url, "typed_j").orderBy("ID").collect()
    assert(rows(0) === Row(1L, "a",
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), true))
    assert(rows(1) === Row(2L, null, null, null))
  }
}
