package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.{AudioHash, Codecs, MultimodalOps}

/** Streaming perceptual near-dup admission (images via dHash, audio
  * via the energy-delta hash) against a release-time limb index:
  * verdicts must equal the brute-force limb-collision ground truth,
  * be independent of how arrivals were batched, and converge under a
  * crash-replayed batch (idempotent per-batch overwrite).
  */
case class MediaItem(media_id: Long, payload: Array[Byte])

class MediaDedupStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Brute-force ground truth mirroring admitBatch's semantics:
    * candidates share at least one limb AT THE SAME POSITION; best =
    * (hamming, base_id)-min; admit iff no candidate within MaxHam.
    */
  private def truth(batch: Seq[(Long, Array[Int])],
      base: Seq[(Long, Array[Int])])
      : Map[Long, (Option[(Long, Long)], Boolean)] =
    batch.map { case (id, ls) =>
      val cands = base.filter { case (bid, bls) =>
        bid != id && (0 until 4).exists(l => bls(l) == ls(l))
      }.map { case (bid, bls) =>
        val ham = (0 until 4)
          .map(l => Integer.bitCount(bls(l) ^ ls(l))).sum.toLong
        (ham, bid)
      }
      if (cands.isEmpty) id -> (None, true)
      else {
        val best = cands.min
        id -> (Some((best._2, best._1)), best._1 > MediaDedupStream.MaxHam)
      }
    }.toMap

  private def collectHashes(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Array[Int])] =
    df.collect().map(r => (r.getLong(0),
      Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toSeq

  private def readVerdicts(out: String)
      : Map[Long, (Option[(Long, Long)], Boolean)] =
    spark.read.parquet(out)
      .select("media_id", "best_base", "best_hamming", "admit")
      .collect().map { r =>
        val best = if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getLong(2)))
        r.getLong(0) -> (best, r.getBoolean(3))
      }.toMap

  test("image admission: ground-truth parity, batching invariance, replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // q140's scene fixture: 10 scenes of 4 — v0 base; v1 copy
    // (hamming 0), v2 local edit (<= 5), v3 unrelated (~32)
    val docs = spark.range(0, 40).select(col("id").as("doc_id"))
    val media = MultimodalOps.dhashMediaFromDocuments(docs)
      .as[MediaItem].collect().toSeq
    val baseMedia = media.filter(_.media_id % 4 == 0)
    val batchMedia = media.filter(_.media_id % 4 != 0)
    val baseIndex = MediaDedupStream.buildImageIndex(
      baseMedia.toDF("media_id", "payload")).persist()
    baseIndex.count()

    val out = Files.createTempDirectory("img_out").toString
    val ckpt = Files.createTempDirectory("img_ckpt").toString
    val (b1, b2) = batchMedia.partition(_.media_id % 8 < 4)
    val in = MemoryStream[MediaItem]
    val q = MediaDedupStream.imageAdmissionStream(
      spark, in.toDS().toDF(), baseIndex, out, ckpt)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = readVerdicts(out)
    val expect = truth(
      collectHashes(MediaDedupStream.buildImageIndex(
        batchMedia.toDF("media_id", "payload"))),
      collectHashes(baseIndex))
    assert(got == expect, s"verdicts diverge from brute force:\n$got\nvs\n$expect")
    // scene structure sanity: every v1 copy rejects at hamming 0
    // against its scene's v0; every v3 unrelated admits
    for ((id, (best, admit)) <- got if id % 4 == 1) {
      assert(!admit && best.contains((id - 1, 0L)),
        s"brightness copy $id must reject at hamming 0: $best")
    }
    for ((id, (_, admit)) <- got if id % 4 == 3)
      assert(admit, s"unrelated raster $id must admit")
    assert(got.exists { case (id, (_, admit)) => id % 4 == 2 && !admit },
      "local edits must reject within MaxHam")
    baseIndex.unpersist()
  }

  test("image admission: crash-replayed batch converges") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = spark.range(0, 8).select(col("id").as("doc_id"))
    val media = MultimodalOps.dhashMediaFromDocuments(docs)
      .as[MediaItem].collect().toSeq
    val baseIndex = MediaDedupStream.buildImageIndex(
      media.filter(_.media_id % 4 == 0).toDF("media_id", "payload"))
      .persist()
    baseIndex.count()
    val batch = media.filter(_.media_id % 4 != 0)
    val out = Files.createTempDirectory("img_replay_out").toString
    val ckpt = Files.createTempDirectory("img_replay_ckpt").toString
    val in = MemoryStream[MediaItem]
    val q1 = MediaDedupStream.imageAdmissionStream(
      spark, in.toDS().toDF(), baseIndex, out, ckpt,
      postBatchHook = _ => sys.error("injected crash"))
    in.addData(batch: _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    // the verdicts landed before the crash; the replay must rewrite
    // the same batch dir, not duplicate it
    val in2 = MemoryStream[MediaItem]
    val q2 = MediaDedupStream.imageAdmissionStream(
      spark, in2.toDS().toDF(), baseIndex, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == batch.size.toLong,
      "replay duplicated or dropped verdicts")
    assert(rows.select("media_id").distinct().count() == batch.size.toLong)
    baseIndex.unpersist()
  }

  test("re-delivered item already in the base index: already_indexed, " +
      "not re-admitted") {
    import spark.implicits._
    val docs = spark.range(0, 8).select(col("id").as("doc_id"))
    val media = MultimodalOps.dhashMediaFromDocuments(docs)
      .as[MediaItem].collect().toSeq
    val baseIndex = MediaDedupStream.buildImageIndex(
      media.filter(_.media_id % 4 == 0).toDF("media_id", "payload"))
      .persist()
    baseIndex.count()
    // the batch RE-DELIVERS a base item (id 0) alongside fresh items:
    // with the self-match silently excluded the re-delivery would
    // admit again (and an admit-and-grow caller would duplicate it)
    val batch = media.filter(m => m.media_id == 0 || m.media_id % 4 == 3)
    val verdicts = MediaDedupStream.admitBatch(
      MediaDedupStream.buildImageIndex(
        batch.toDF("media_id", "payload")), baseIndex)
      .select("media_id", "verdict", "admit").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(verdicts(0L) == ("already_indexed", false),
      s"re-delivered base item must not re-admit: ${verdicts(0L)}")
    for ((id, (v, admit)) <- verdicts if id % 4 == 3)
      assert(admit && v == "admit", s"unrelated $id must still admit: $v")
    // copies of base items that are NOT base ids stay 'duplicate'
    val copies = media.filter(_.media_id % 4 == 1)
    val v2 = MediaDedupStream.admitBatch(
      MediaDedupStream.buildImageIndex(
        copies.toDF("media_id", "payload")), baseIndex)
      .select("media_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2.values.toSet == Set("duplicate"))
    baseIndex.unpersist()
  }

  test("audio admission: copies reject at hamming 0, unrelated admit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // scenes of 3: v0 base tone mix, v1 gain-doubled copy (hamming 0
    // — energy scaling preserves every delta comparison), v2
    // unrelated (different multiplier family)
    def wav(scene: Long, variant: Long): Array[Byte] = {
      val sample: Int => Int = { i =>
        val v =
          if (variant == 2) (scene * 1579032867L + i * 97003L + 7) % 1000003L
          else (scene * 2654435761L + i * 40503L) % 1000003L
        val base = (v * v % 1000003L % 4001L - 2000L).toInt
        if (variant == 1) 2 * base else base
      }
      Codecs.encodeWav(8000, AudioHash.MinSamples, sample)
    }
    val base = (0L until 6L).map(s => MediaItem(s * 3, wav(s, 0)))
    val batch = (0L until 6L).flatMap(s => Seq(
      MediaItem(s * 3 + 1, wav(s, 1)), MediaItem(s * 3 + 2, wav(s, 2))))
    val baseIndex = MediaDedupStream.buildAudioIndex(
      base.toDF("media_id", "payload")).persist()
    baseIndex.count()
    val out = Files.createTempDirectory("aud_out").toString
    val ckpt = Files.createTempDirectory("aud_ckpt").toString
    val in = MemoryStream[MediaItem]
    val q = MediaDedupStream.audioAdmissionStream(
      spark, in.toDS().toDF(), baseIndex, out, ckpt)
    try {
      in.addData(batch: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = readVerdicts(out)
    val expect = truth(
      collectHashes(MediaDedupStream.buildAudioIndex(
        batch.toDF("media_id", "payload"))),
      collectHashes(baseIndex))
    assert(got == expect)
    for ((id, (best, admit)) <- got if id % 3 == 1)
      assert(!admit && best.contains((id - 1, 0L)),
        s"gain copy $id must reject at hamming 0: $best")
    for ((id, (_, admit)) <- got if id % 3 == 2)
      assert(admit, s"unrelated signal $id must admit")
    baseIndex.unpersist()
  }
}
