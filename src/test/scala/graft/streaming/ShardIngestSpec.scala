package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.{GzipMembers, Tfrecord}

/** The composed shard ingest (binary drop folder → q153/q154 walk →
  * keyed merge): batch/stream parity against the walks run directly,
  * quarantine-WHOLE on a poisoned shard, and exactly-once table state
  * across a post-merge crash replay (the IngestSpec protocol).
  */
class ShardIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def drop(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    val tmp = Files.createTempFile("shard", ".bin")
    Files.write(tmp, bytes)
    Files.move(tmp, dir.resolve(name))
  }

  /** q153's member construction for one shard id. */
  private def gzipShard(id: Long): Array[Byte] =
    GzipMembers.encodeMembers((0 until (1 + id % 4).toInt).map { j =>
      val name = if (j % 2 == 0) s"rec$j.warc" else null
      val body = ("doc " + id + " record " + j + " ") *
        (1 + (id + j) % 6).toInt
      (name, body.getBytes("UTF-8"))
    })

  /** q154's record construction for one shard id. */
  private def tfShard(id: Long): Array[Byte] =
    Tfrecord.encodeShard((0 until (1 + id % 5).toInt).map { j =>
      val body = ("doc " + id + " example " + j + " ") *
        (1 + (id + j) % 6).toInt
      Tfrecord.encodeExample(id * 3 + j, body.getBytes("UTF-8"))
    })

  test("gzip: stream/batch parity, poison quarantines whole, crash replay converges") {
    val root = Files.createTempDirectory("shardingest")
    val dropDir = Files.createDirectories(root.resolve("drop"))
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("members").toString
    val quarantine = root.resolve("quarantine").toString

    // ---- phase 1: two clean shards + one poisoned (ISIZE flipped) ----
    drop(dropDir, "s0.gz", gzipShard(0))
    drop(dropDir, "s1.gz", gzipShard(1))
    val poison = gzipShard(2)
    poison(poison.length - 2) = (poison(poison.length - 2) ^ 1).toByte
    drop(dropDir, "s2.gz", poison)
    val q1 = ShardIngest.gzipShardIngest(spark, dropDir.toString, table,
      ckpt, quarantineDir = quarantine)
    try q1.processAllAvailable() finally q1.stop()

    val got = ShardIngest.readShardTable(spark, table)
      .select("shard", "member", "name", "n_bytes", "body_md5")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSet
    // batch-mode ground truth: the walks run directly on clean shards
    val expect = (for {
      (sh, id) <- Seq(("s0.gz", 0L), ("s1.gz", 1L))
      m <- GzipMembers.walk(id, gzipShard(id)).get
    } yield (sh, m.member, m.name, m.n_bytes, m.body_md5)).toSet
    assert(got == expect, s"stream/batch divergence:\n$got\nvs\n$expect")
    assert(!got.exists(_._1 == "s2.gz"), "poisoned shard leaked rows")

    // quarantine names the whole shard with the reason
    val quar = spark.read.json(quarantine)
      .select("raw", "reason").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(quar == Set(("s2.gz", "checksum_or_framing")))

    // ---- phase 2: new shard, crash AFTER merge, BEFORE checkpoint ----
    drop(dropDir, "s3.gz", gzipShard(3))
    var batches = 0
    val q2 = ShardIngest.gzipShardIngest(spark, dropDir.toString, table,
      ckpt, quarantineDir = quarantine,
      postMergeHook = { _ => batches += 1; sys.error("injected crash") })
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination()
    }
    q2.stop()
    assert(batches == 1, s"restart must see exactly the new shard: $batches")

    // ---- phase 3: resume; the replayed batch's upsert converges ----
    val q3 = ShardIngest.gzipShardIngest(spark, dropDir.toString, table,
      ckpt, quarantineDir = quarantine)
    try q3.processAllAvailable() finally q3.stop()
    val fin = ShardIngest.readShardTable(spark, table)
    assert(fin.count() == fin.select("rec_key").distinct().count(),
      "replay duplicated keys")
    val s3rows = fin.filter(col("shard") === "s3.gz").count()
    assert(s3rows == GzipMembers.walk(3L, gzipShard(3)).get.size,
      "replayed shard's rows wrong after convergence")
  }

  test("zip: stream/batch parity, garbage and truncation quarantine") {
    import graft.multimodal.Archives
    val root = Files.createTempDirectory("zipingest")
    val dropDir = Files.createDirectories(root.resolve("drop"))
    def zipShard(id: Long): Array[Byte] =
      Archives.encodeZip((0 until (2 + id % 3).toInt).map(j =>
        (s"e$j.txt", Archives.plantedBody(id, j).getBytes("UTF-8"))))
    drop(dropDir, "z0.zip", zipShard(0))
    drop(dropDir, "z1.zip", zipShard(1))
    // garbage payload: no PK magic — must quarantine, not read as an
    // empty archive (ZipInputStream returns null on garbage)
    drop(dropDir, "z2.zip", "this is not a zip at all".getBytes)
    // truncated MID-ENTRY — the walk throws, quarantine-whole.
    // (A cut that only clips the central directory is NOT detectable
    // by a streaming walk — entry CRCs all verified — and such a
    // shard legitimately ingests; see zipEntriesStrict's scaladoc.)
    drop(dropDir, "z3.zip", zipShard(3).take(zipShard(3).length / 2))
    val table = root.resolve("entries").toString
    val quarantine = root.resolve("quarantine").toString
    val q = ShardIngest.zipShardIngest(spark, dropDir.toString, table,
      root.resolve("ckpt").toString, quarantineDir = quarantine)
    try q.processAllAvailable() finally q.stop()
    val got = ShardIngest.readShardTable(spark, table)
      .select("shard", "idx", "entry", "n_bytes", "method", "body_md5")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    val expect = (for {
      (sh, id) <- Seq(("z0.zip", 0L), ("z1.zip", 1L))
      ((name, n, method, md5), i) <-
        Archives.zipEntriesStrict(zipShard(id)).get.zipWithIndex
    } yield (sh, i.toLong, name, n, method, md5)).toSet
    assert(got == expect)
    // both methods exercised (encodeZip alternates DEFLATED/STORED)
    assert(got.map(_._5) == Set("deflated", "stored"))
    val quar = spark.read.json(quarantine).select("raw").collect()
      .map(_.getString(0)).toSet
    assert(quar == Set("z2.zip", "z3.zip"))
    // decompression-bomb bound: a tiny DEFLATE entry inflating past
    // the cap quarantines instead of streaming gigabytes (the
    // GzipMembers.walk twin) — under its OWN reason, so an
    // oversized-but-valid shard is distinguishable from corruption
    val bomb = Archives.encodeZip(Seq(
      ("bomb.bin", Array.fill[Byte](1 << 20)(0))))
    assert(Archives.zipEntriesStrict(bomb, maxBytes = 1 << 16).isEmpty)
    assert(Archives.zipEntriesStrict(bomb, maxBytes = 1 << 21).isDefined)
    assert(Archives.zipEntriesDetail(bomb, maxBytes = 1 << 16)
      == Left("too_large"))
    assert(Archives.zipEntriesDetail("garbage".getBytes, 1 << 16)
      == Left("checksum_or_framing"))
    import graft.multimodal.GzipMembers
    val gzBomb = GzipMembers.encodeMembers(Seq(
      ("b.warc", Array.fill[Byte](1 << 20)(0))))
    assert(GzipMembers.walkDetail(0L, gzBomb, maxBytes = 1 << 16)
      == Left("too_large"))
    assert(GzipMembers.walkDetail(0L, "garbage".getBytes, 1 << 16)
      == Left("checksum_or_framing"))
  }

  test("zip: maxBytes is an ingest parameter; over-cap valid shards " +
      "quarantine as too_large and re-ingest with a raised cap") {
    import graft.multimodal.Archives
    val root = Files.createTempDirectory("zipcap")
    val dropDir = Files.createDirectories(root.resolve("drop"))
    val small = Archives.encodeZip(Seq(
      ("a.txt", Archives.plantedBody(1, 0).getBytes("UTF-8"))))
    val big = Archives.encodeZip(Seq(
      ("big.bin", Array.fill[Byte](1 << 18)(7))))
    drop(dropDir, "ok.zip", small)
    drop(dropDir, "big.zip", big)
    val table = root.resolve("entries").toString
    val quarantine = root.resolve("quarantine").toString
    val q = ShardIngest.zipShardIngest(spark, dropDir.toString, table,
      root.resolve("ckpt").toString, quarantineDir = quarantine,
      maxBytes = 1 << 16)
    try q.processAllAvailable() finally q.stop()
    assert(ShardIngest.readShardTable(spark, table)
      .select("shard").collect().map(_.getString(0)).toSet
      == Set("ok.zip"))
    val quar = spark.read.json(quarantine)
      .select("raw", "reason").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(quar == Set(("big.zip", "too_large")))
    // the operator's recourse: a raised cap ingests the same shard
    // into a fresh table (new checkpoint — the file was already seen)
    val drop2 = Files.createDirectories(root.resolve("drop2"))
    drop(drop2, "big.zip", big)
    val table2 = root.resolve("entries2").toString
    val q2 = ShardIngest.zipShardIngest(spark, drop2.toString, table2,
      root.resolve("ckpt2").toString,
      quarantineDir = root.resolve("quarantine2").toString,
      maxBytes = 1 << 20)
    try q2.processAllAvailable() finally q2.stop()
    assert(ShardIngest.readShardTable(spark, table2)
      .select("shard", "entry").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("big.zip", "big.bin")))
  }

  test("webdataset tar: stems + sample counts, corrupt header quarantines") {
    import graft.multimodal.Archives
    val root = Files.createTempDirectory("taringest")
    val dropDir = Files.createDirectories(root.resolve("drop"))
    // WebDataset shape: sample stems with 2-3 members each
    def tarShard(id: Long): Array[Byte] =
      Archives.encodeTar((0 until (2 + id % 2).toInt).flatMap { s =>
        val stem = f"sample$id%d_$s%03d"
        Seq((s"$stem.jpg", Archives.plantedBody(id, s).getBytes),
          (s"$stem.json", s"""{"k":$s}""".getBytes)) ++
          (if (s % 2 == 0) Seq((s"$stem.cls", s"$s".getBytes)) else Nil)
      })
    drop(dropDir, "w0.tar", tarShard(0))
    drop(dropDir, "w1.tar", tarShard(1))
    val poison = tarShard(2)
    poison(148) = '9' // corrupt the first header's checksum field
    drop(dropDir, "w2.tar", poison)
    val table = root.resolve("members").toString
    val quarantine = root.resolve("quarantine").toString
    val q = ShardIngest.tarShardIngest(spark, dropDir.toString, table,
      root.resolve("ckpt").toString, quarantineDir = quarantine)
    try q.processAllAvailable() finally q.stop()
    val got = ShardIngest.readShardTable(spark, table)
      .select("shard", "stem", "entry", "n_in_sample")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    // every .jpg/.json pair shares a stem; .cls-bearing samples
    // count 3, others 2
    assert(got.nonEmpty)
    for ((_, stem, entry, n) <- got) {
      assert(entry.startsWith(stem))
      val expectedN = if (stem.endsWith("0") || stem.endsWith("2")) 3L else 2L
      assert(n == expectedN, s"$stem expected $expectedN members, got $n")
    }
    val shards = got.map(_._1)
    assert(shards == Set("w0.tar", "w1.tar"))
    val quar = spark.read.json(quarantine).select("raw").collect()
      .map(_.getString(0)).toSet
    assert(quar == Set("w2.tar"))
  }

  test("tfrecord: stream/batch parity and poison quarantine") {
    val root = Files.createTempDirectory("tfingest")
    val dropDir = Files.createDirectories(root.resolve("drop"))
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("records").toString
    val quarantine = root.resolve("quarantine").toString

    drop(dropDir, "t1.tfrecord", tfShard(1))
    drop(dropDir, "t4.tfrecord", tfShard(4))
    val poison = tfShard(2)
    poison(14) = (poison(14) ^ 1).toByte // body byte -> data CRC fails
    drop(dropDir, "t2.tfrecord", poison)
    val q = ShardIngest.tfrecordShardIngest(spark, dropDir.toString,
      table, ckpt, quarantineDir = quarantine)
    try q.processAllAvailable() finally q.stop()

    val got = ShardIngest.readShardTable(spark, table)
      .select("shard", "rec", "n_bytes", "f1", "f2_md5")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val expect = (for {
      (sh, id) <- Seq(("t1.tfrecord", 1L), ("t4.tfrecord", 4L))
      m <- Tfrecord.walk(id, tfShard(id)).get
    } yield (sh, m.rec, m.n_bytes, m.f1, m.f2_md5)).toSet
    assert(got == expect)
    val quar = spark.read.json(quarantine).select("raw").collect()
      .map(_.getString(0)).toSet
    assert(quar == Set("t2.tfrecord"))
  }
}
