package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: write named SparkEntry.oracleSql entries to
  * outDir/<name>.sql — for iterating a single query's DuckDB oracle
  * without running the full Verify dump.
  *
  * Usage: runMain graft.tools.DumpOracle <outDir> <q1> [q2 ...]
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    if (args.length < 2)
      sys.error("usage: DumpOracle <outDir> <q1> [q2 ...]")
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    args.drop(1).foreach { name =>
      val sql = graft.SparkEntry.oracleSql.getOrElse(name,
        sys.error(s"unknown oracle $name"))
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
      println(s"[dumporacle] wrote $outDir/$name.sql")
    }
  }
}
