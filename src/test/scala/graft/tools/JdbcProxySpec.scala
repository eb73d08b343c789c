package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sinks.JdbcUpsert
import graft.sources.Jdbc

/** The reflective JDBC remoting shim that closes q101's multi-JVM
  * exemption: the full protocol (connect, DDL-created table, batched
  * upsert with UPDATE/INSERT branches, Spark's partitioned JDBC read
  * with pushed predicates, SQLException propagation) exercised over a
  * real localhost socket — same wire path as local-cluster, the JVM
  * boundary aside.
  */
class JdbcProxySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val embedded = "jdbc:derby:memory:graftproxyspec;create=true"
  private lazy val proxied = JdbcProxy.serve(embedded)

  private def exec(sql: String*): Unit = {
    val c = DriverManager.getConnection(embedded)
    try {
      val st = c.createStatement()
      sql.foreach(st.execute)
      st.close()
    } finally c.close()
  }

  test("proxy driver registers and refuses foreign URLs") {
    val d = new JdbcProxyDriver
    assert(d.acceptsURL("jdbc:graftproxy://localhost:1234/"))
    assert(!d.acceptsURL("jdbc:derby:memory:x"))
    assert(d.connect("jdbc:derby:memory:x", null) == null)
  }

  test("upsert + partitioned read round-trip through the socket") {
    import spark.implicits._
    try exec("DROP TABLE proxy_t")
    catch { case _: java.sql.SQLException => () }
    exec("CREATE TABLE proxy_t (id BIGINT PRIMARY KEY, " +
      "name VARCHAR(16), score BIGINT)")
    val df = (0 until 97).map(i => (i.toLong, s"n$i", i * 10L))
      .toDF("id", "name", "score").repartition(4)
    JdbcUpsert.upsert(df, proxied, "proxy_t", Seq("id"), batchSize = 13)
    // re-upsert a slice with new payloads: the UPDATE branch, remoted
    val upd = (0 until 20).map(i => (i.toLong, "upd", 7L))
      .toDF("id", "name", "score").repartition(3)
    JdbcUpsert.upsert(upd, proxied, "proxy_t", Seq("id"), batchSize = 13)

    val back = Jdbc.readPartitioned(spark, proxied, "proxy_t",
      "id", 0L, 97L, 4)
    assert(back.rdd.getNumPartitions === 4)
    val rows = back.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows.size === 97)
    assert(rows(5L) === ("upd", 7L))
    assert(rows(50L) === ("n50", 500L))
    // predicate pushdown survives the proxied schema resolution
    val filtered = Jdbc.read(spark, proxied, "proxy_t")
      .filter(col("SCORE") === 7L)
    assert(filtered.count() === 20)
  }

  test("SQLExceptions cross the wire with state and code") {
    val c = DriverManager.getConnection(proxied)
    try {
      val st = c.createStatement()
      val e = intercept[java.sql.SQLException] {
        st.execute("DROP TABLE definitely_absent_t")
      }
      // Derby's table-missing SQLState, preserved for callers that
      // branch on it (q101's DROP guard, the upsert probe path)
      assert(e.getSQLState === "42Y55", e.toString)
      st.close()
    } finally c.close()
  }

  test("one proxied database state is shared across connections") {
    val c1 = DriverManager.getConnection(proxied)
    val c2 = DriverManager.getConnection(proxied)
    try {
      val rs = c1.createStatement()
        .executeQuery("SELECT count(*) FROM proxy_t")
      rs.next()
      val n1 = rs.getLong(1)
      val rs2 = c2.createStatement()
        .executeQuery("SELECT count(*) FROM proxy_t")
      rs2.next()
      assert(rs2.getLong(1) === n1 && n1 === 97L)
    } finally { c1.close(); c2.close() }
  }

  test("a long-lived connection survives >4096 proxied calls") {
    // regression pin for the r12 deserialization filter: maxrefs
    // counts CUMULATIVELY over the stream, so a per-stream cap killed
    // every connection after ~2k calls (each call ships 2 arrays) —
    // exactly the shape of a real executor's per-partition upsert
    // loop. 5000 round-trips must all succeed on ONE socket.
    val c = DriverManager.getConnection(proxied)
    try {
      val st = c.prepareStatement("VALUES (CAST(? AS INTEGER))")
      var i = 0
      while (i < 5000) {
        st.setInt(1, i)
        val rs = st.executeQuery()
        rs.next()
        assert(rs.getInt(1) == i)
        rs.close()
        i += 1
      }
      st.close()
    } finally c.close()
  }
}
