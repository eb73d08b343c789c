package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q156's measured number, pinned (the ClusteredRecallSpec posture):
  * on the planted scene fixture every true neighbor sits within the
  * pigeonhole-exhaustive hamming range, so banded recall must be
  * EXACTLY 1.0 — any regression in the limb layout, the band keys,
  * or the bucket cap reds here before the oracle gate even runs.
  */
class AudioAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("banded audio recall is 1.0 on the planted fixture") {
    val rows = graft.SparkEntry
      .queries("q156_audio_neardup_audit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty, "the anchor panel must be non-empty")
    for (r <- rows) {
      assert(r.getAs[Long]("n_exact") > 0L)
      assert(r.getAs[Long]("recall_e6") === 1000000L,
        s"anchor ${r.getAs[Long]("anchor_id")} lost a neighbor: $r")
    }
  }
}
