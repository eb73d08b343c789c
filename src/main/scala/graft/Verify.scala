package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev
    // iteration on one query without the full 100+-query dump; the
    // driver always invokes the 2-arg form)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Multi-JVM proof mode (SCALE.md "Multi-JVM execution"): the
    // driver gate runs local[k] (one JVM — broadcasts never cross a
    // process boundary, aggregate buffers never serialize), so
    // SPARK_GRAFT_MASTER=local-cluster[2,8,4096] re-runs the SAME
    // gate against real separate executor JVMs. local-cluster needs
    // the application classes as a jar on the executors:
    // SPARK_GRAFT_JARS names it (sbt package output).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = GraftSession.builder(master, cpus)
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    // q101 historically carried a multi-JVM exemption (in-memory
    // Derby is per-JVM); graft.tools.JdbcProxy closed it — q101 now
    // routes executor connections through a driver-JVM socket proxy
    // under local-cluster, so every query runs under every master.
    val skip: Set[String] = Set.empty
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .filter { case (n, _) => only.forall(_(n)) }.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries may persist() intermediates (self-join barriers);
      // drop them so 35+ queries don't accumulate in one JVM
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the banded-alignment oracle is regenerated at the SRP plane
    // count derived from THIS dir's side cardinalities (identical to
    // the static entry at every driver gate SF; differs only on
    // replica dirs past the 2048/side boundary, where the static
    // 8-plane SQL would be wrong) — the self-describing-boundary
    // treatment that lets the replica gate cover the ANN family
    // Overlay only when q122/q123 is actually in this dump's scope,
    // and never let an overlay failure (missing/corrupt embeddings on
    // a partial replica dir) zero the whole gate — the static SQL
    // stays in place as the fallback, correct at every driver SF.
    val overlay: Map[String, String] =
      if (!only.forall(f =>
          f("q122_banded_align") || f("q123_align_recall"))) Map.empty
      else try graft.queries.VectorQueries.alignOracleOverlay(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] align oracle overlay failed, keeping static SQL: " +
            e.getMessage)
        Map.empty
      }
    val oracle = SparkEntry.oracleSql ++ overlay
    val json = oracle.filterNot { case (k, _) => skip(k) }
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
