package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.MultimodalOps._

/** The decoder plug-in seam must behave like a real codec boundary:
  * one handle opened per batch (not per item, not per partition),
  * reused across the batch — proven by injecting a counting factory
  * at the documented ===STUB=== seam.
  */
class BatchedDecodeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("codec factory runs once per 64-item batch and results are unchanged") {
    import spark.implicits._
    // 200 payloads in ONE partition -> ceil(200/64) = 4 batches
    val media = spark.range(200)
      .select(col("id").as("media_id"),
        encodeMedia(lit(1), lit(8), lit(8), lit(1),
          encode(concat(lit("body-"), col("id")), "UTF-8")).as("payload"))
      .repartition(1)
    BatchedDecodeSpec.opened.set(0)
    val probed = BatchedDecode.decodeBatched(media, 64, () => {
      BatchedDecodeSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).collect()
    assert(probed.length == 200)
    assert(BatchedDecodeSpec.opened.get() == 4,
      s"expected 4 codec opens for 200 rows / 64, got ${BatchedDecodeSpec.opened.get()}")
    // the injected handle must produce byte-identical output to the
    // default path (the seam only swaps the handle, never the logic)
    val dflt = BatchedDecode.decodeBatched(media, 64).collect()
    assert(probed.sortBy(_.media_id).toSeq == dflt.sortBy(_.media_id).toSeq)
  }

  test("partitioning bounds the codec opens, not the row count") {
    import spark.implicits._
    val media = spark.range(100)
      .select(col("id").as("media_id"),
        encodeMedia(lit(1), lit(8), lit(8), lit(1),
          encode(concat(lit("b"), col("id")), "UTF-8")).as("payload"))
      .repartition(4)
    BatchedDecodeSpec.opened.set(0)
    val n = BatchedDecode.decodeBatched(media, 64, () => {
      BatchedDecodeSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).count()
    assert(n == 100)
    // 4 partitions x ceil(~25/64) = one open per non-empty partition
    assert(BatchedDecodeSpec.opened.get() == 4,
      s"expected one codec open per partition, got ${BatchedDecodeSpec.opened.get()}")
  }
}

/** JVM-wide probe counter — local[*] tests share the JVM, so the
  * executor-side increments land here.
  */
object BatchedDecodeSpec {
  val opened = new AtomicInteger(0)
}
