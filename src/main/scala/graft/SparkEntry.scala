package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ApproachQueries, MultimodalQueries, Relational, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the full approach-detection pipeline (FlightGen
    * traces -> state machine -> 18-column approaches table) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    ApproachQueries.q20(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ ApproachQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ ApproachQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ MultimodalQueries.oracles
}
