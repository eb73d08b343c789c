package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Statement, Types}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JDBC upsert sink (SURVEY.md §2.1 S6/S7): the reference's output
  * boundary — batched `INSERT .. ON DUPLICATE KEY UPDATE` of 18-col
  * approach tuples (`FlightAnalysis.py:22-30,400-431`) and the
  * per-flight done-flag `UPDATE` (`py:432-437`). [[Sinks]] carries the
  * parquet twin the driver contract grades; this is the real-RDBMS
  * form, kept dialect-portable: per batch of rows, one batched
  * `UPDATE` by key, then one batched `INSERT` of exactly the rows the
  * update counts reported missing — the same converged state as
  * MySQL's upsert without leaning on any vendor's conflict syntax
  * (Derby, the in-container test DB, has none that takes clean
  * parameter markers).
  *
  * Execution shape, sized for a 1000-executor write:
  *   - `foreachPartition`: ONE connection and two prepared statements
  *     per partition, reused across all its rows (the reference's
  *     single long-lived cursor, `main.py:52-54`, per-slice);
  *     `batchSize`-row JDBC batches amortize round-trips.
  *   - per-chunk commit: autocommit off, one commit per batch — a
  *     crash mid-partition leaves whole batches, never torn rows.
  *   - IDEMPOTENT by key: a retried/replayed task re-upserts the same
  *     key→row mapping and converges, which is what makes at-least-
  *     once task execution safe here (same argument as
  *     [[Sinks.mergeApproachesTable]]; turn OFF speculation for JDBC
  *     writes — two live attempts of one partition would contend on
  *     row locks).
  *   - fan-out is the caller's dial via `df.repartition(n)`: n
  *     concurrent connections is a DATABASE capacity question (see
  *     [[graft.sources.Jdbc]]).
  *
  * Drivers that report `SUCCESS_NO_INFO` for batched updates (MySQL
  * with `rewriteBatchedStatements=on`) can't distinguish miss from
  * hit; this sink then falls back to treating the whole chunk as
  * update-then-insert-the-rest being unavailable and probes row by
  * row — correctness first, tune the driver flag off for upserts.
  */
object JdbcUpsert {

  /** Upsert `df` into `table` keyed by `keyCols` (must be a real
    * unique/PK constraint in the DB — the idempotence argument rests
    * on it). Requires at least one non-key column (a pure key table
    * has nothing to update; use plain insert-ignore semantics
    * instead).
    */
  def upsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500,
      props: Properties = new Properties()): Unit = {
    val schema = df.schema
    val keys = keyCols.toArray
    require(keys.nonEmpty, "upsert needs key columns")
    val nonKeys = schema.fieldNames.filterNot(keys.contains)
    require(nonKeys.nonEmpty, "upsert needs at least one non-key column")
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"key column $k not in ${schema.fieldNames.mkString(",")}"))

    val updateSql = s"UPDATE $table SET " +
      nonKeys.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + keys.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (" +
      schema.fieldNames.mkString(", ") + ") VALUES (" +
      schema.fieldNames.map(_ => "?").mkString(", ") + ")"
    val updateIdx = (nonKeys ++ keys).map(schema.fieldIndex)
    val insertIdx = schema.fieldNames.map(schema.fieldIndex)
    val sqlTypes = schema.fields.map(f => jdbcType(f.dataType))
    val bs = batchSize
    val (u, p) = (url, props)

    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connect(u, p)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            rows.grouped(bs).foreach { chunk =>
              upsertChunk(chunk, upd, ins, updateIdx, insertIdx, sqlTypes)
              conn.commit()
            }
          } finally { upd.close(); ins.close() }
        } finally { conn.close() }
      }
    }
  }

  /** DriverManager.getConnection with an executor-classloader
    * fallback: an executor JVM can initialize DriverManager (its
    * one-time ServiceLoader scan) before the application jar is on
    * the thread's context classloader, leaving application-provided
    * drivers (graft.tools.JdbcProxyDriver under local-cluster)
    * undiscovered — "No suitable driver". Rescan over THIS class's
    * loader, which by definition can see every driver shipped with
    * the application.
    */
  private def connect(url: String, props: Properties): Connection =
    try DriverManager.getConnection(url, props)
    catch {
      // The rescan runs on ANY SQLException rather than matching the
      // JDK's "No suitable driver" message text (implementation-
      // specific wording) or SQLState 08001 alone: if a driver IS
      // registered and the failure is real, the rescan re-fails the
      // same way and the ORIGINAL exception is rethrown — the only
      // cost is one extra connect attempt on a genuinely dead URL.
      case e: java.sql.SQLException =>
        val it = java.util.ServiceLoader
          .load(classOf[java.sql.Driver], getClass.getClassLoader).iterator()
        var c: Connection = null
        try {
          while (c == null && it.hasNext) {
            val d = it.next()
            if (d.acceptsURL(url)) c = d.connect(url, props)
          }
        } catch {
          case t: Throwable => e.addSuppressed(t) // keep both stories
        }
        if (c == null) throw e
        c
    }

  private def upsertChunk(chunk: Seq[Row], upd: PreparedStatement,
      ins: PreparedStatement, updateIdx: Array[Int], insertIdx: Array[Int],
      sqlTypes: Array[Int]): Unit = {
    chunk.foreach { row => bind(upd, row, updateIdx, sqlTypes); upd.addBatch() }
    val counts = upd.executeBatch()
    val missing: Seq[Row] =
      if (counts.contains(Statement.SUCCESS_NO_INFO)) {
        // driver won't say which rows matched: probe one by one
        chunk.filter { row =>
          bind(upd, row, updateIdx, sqlTypes)
          upd.executeUpdate() == 0
        }
      } else chunk.zip(counts).collect { case (row, 0) => row }
    if (missing.nonEmpty) {
      missing.foreach { row =>
        bind(ins, row, insertIdx, sqlTypes); ins.addBatch()
      }
      ins.executeBatch()
    }
  }

  private def bind(ps: PreparedStatement, row: Row, idx: Array[Int],
      sqlTypes: Array[Int]): Unit = {
    var i = 0
    while (i < idx.length) {
      val col = idx(i)
      if (row.isNullAt(col)) ps.setNull(i + 1, sqlTypes(col))
      else ps.setObject(i + 1, row.get(col))
      i += 1
    }
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case ByteType => Types.TINYINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case StringType => Types.VARCHAR
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case BinaryType => Types.VARBINARY
    case _: DecimalType => Types.DECIMAL
    case other =>
      throw new IllegalArgumentException(
        s"unsupported JDBC upsert type ${other.catalogString}")
  }
}
