package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared per-batch-shard reading for the standing monitors
  * (DriftStream, EmbDriftStream, RateAnomalyStream): their finishers
  * may be polled from the moment the stream starts, BEFORE the first
  * non-empty micro-batch has written a `batch=<id>` shard — at which
  * point the partials dir has no parquet to infer a schema from and
  * a bare read throws. One helper instead of one copy per monitor.
  */
private[streaming] object Shards {

  /** Read the accumulated `batch=` shards under `path`, or an empty
    * frame of `schema` if none have landed yet (missing dir
    * included).
    */
  def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasShards = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("batch="))
    if (hasShards)
      // schema PINNED, not inferred: a first batch dir caught
      // mid-write (or crashed mid-write) exists but holds only the
      // committer's _temporary dir — zero data files — and schema
      // inference would throw exactly the pre-first-batch crash this
      // helper closes; with the schema supplied the torn dir reads
      // as zero rows and the next poll sees the completed shard
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }
}
