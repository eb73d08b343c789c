package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The ZIP shard exploder: round-trips with hand-checked member
  * bodies, BOTH compression methods read back from the headers, the
  * one-digest-per-batch seam, and whole-container drops for the
  * malformations a quarantine path must catch.
  */
class ArchivesSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def explodeOne(payload: Array[Byte]): Seq[ZipEntryRow] = {
    import spark.implicits._
    Archives.explodeZipStats(
      Seq((7L, payload)).toDF("media_id", "payload")).collect().toSeq
  }

  test("round-trip: both methods, sizes, and digests match hand values") {
    val bodies = Seq("alpha alpha alpha", "b", "")
    val zip = Archives.encodeZip(
      bodies.zipWithIndex.map { case (b, i) =>
        (s"m$i.txt", b.getBytes("UTF-8")) })
    val rows = explodeOne(zip).sortBy(_.entry)
    assert(rows.map(_.entry) == Seq("m0.txt", "m1.txt", "m2.txt"))
    assert(rows.map(_.n_bytes) == Seq(17L, 1L, 0L))
    // even index deflated, odd stored — read back from the headers
    assert(rows.map(_.method) == Seq("deflated", "stored", "deflated"))
    assert(rows.map(_.body_md5) == bodies.map(md5hex))
  }

  test("planted corpus bodies match the oracle's repeat() closed form") {
    // plantedBody(5, 2) repeats "doc 5 entry 2 " 1+(7%5)=3 times
    assert(Archives.plantedBody(5, 2) ==
      "doc 5 entry 2 doc 5 entry 2 doc 5 entry 2 ")
    assert(Archives.plantedBody(0, 0) == "doc 0 entry 0 ")
  }

  test("malformed containers drop WHOLE; valid neighbors in the batch survive") {
    import spark.implicits._
    val good = Archives.encodeZip(Seq(("a.txt", "hello".getBytes)))
    // cut INSIDE the member's deflate stream (local header is 30 + 5
    // name bytes): the inflater hits EOF mid-member and the container
    // drops. (Clipping only the END-of-central-directory record is
    // NOT a malformation for a streaming reader — it never reads it.)
    val truncated = good.take(40)
    // flip one byte inside the deflated member data: the entry CRC
    // check fires at getNextEntry/close — container dropped whole
    val corrupt = good.clone()
    corrupt(40) = (corrupt(40) ^ 0x5a).toByte
    val rows = Archives.explodeZipStats(
      Seq((1L, good), (2L, truncated), (3L, corrupt),
        (4L, "not a zip at all".getBytes("UTF-8")))
        .toDF("media_id", "payload")).collect()
    assert(rows.map(_.media_id).toSet == Set(1L),
      s"only the intact container may emit rows, got ${rows.toSeq}")
  }

  // ---- tar (ustar / WebDataset shards) ----

  test("tar round-trip: names, bodies, block padding, zero-block end") {
    val entries = Seq(
      ("a.txt", "hello tar".getBytes("UTF-8")),
      ("a.json", ("x" * 513).getBytes("UTF-8")), // spans two blocks
      ("b.txt", Array.emptyByteArray))
    val tar = Archives.encodeTar(entries)
    assert(tar.length % 512 == 0)
    val back = Archives.decodeTar(tar).get
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.map(_._2.toSeq) == entries.map(_._2.toSeq))
  }

  test("tar rejections: checksum corrupt, truncated, missing terminator, bad octal") {
    val ok = Archives.encodeTar(Seq(("a.txt", "hello".getBytes)))
    assert(Archives.decodeTar(ok).isDefined)
    // flip a NAME byte without re-sealing the checksum
    val corrupt = ok.clone(); corrupt(0) = 'z'
    assert(Archives.decodeTar(corrupt).isEmpty)
    // cut mid-member-data
    assert(Archives.decodeTar(ok.take(700)).isEmpty)
    // strip the end-of-archive zero blocks: a truncated shard upload
    assert(Archives.decodeTar(ok.dropRight(1024)).isEmpty)
    // non-octal size field, checksum re-sealed so ONLY the size is bad
    val badSize = ok.clone()
    badSize(124) = '9' + 1 // ':' — outside octal
    java.util.Arrays.fill(badSize, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (badSize(i) & 0xff))
    f"$sum%06o".getBytes.copyToArray(badSize, 148)
    badSize(154) = 0; badSize(155) = ' '
    assert(Archives.decodeTar(badSize).isEmpty)
    // an EMPTY payload is malformed too: tar demands the zero-block
    // terminator, and an empty "archive" is a failed shard write
    assert(Archives.decodeTar(Array[Byte]()).isEmpty)
  }

  test("tar: BSD-style space-padded numeric fields parse (POSIX allows them)") {
    val ok = Archives.encodeTar(Seq(("a.txt", "hello".getBytes)))
    val want = Archives.decodeTar(ok).get
    // rewrite chksum right-justified with LEADING SPACES instead of
    // leading zeros — the same value, the layout historic/BSD
    // writers emit; the reader must not mistake the pad for
    // end-of-field
    val spaced = ok.clone()
    java.util.Arrays.fill(spaced, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (spaced(i) & 0xff))
    val digits = java.lang.Long.toOctalString(sum)
    digits.getBytes.copyToArray(spaced, 148 + (6 - digits.length))
    spaced(154) = 0; spaced(155) = ' '
    val got = Archives.decodeTar(spaced)
    assert(got.isDefined, "space-padded checksum must parse")
    assert(got.get.map { case (n, b) => (n, b.toSeq) } ==
      want.map { case (n, b) => (n, b.toSeq) })
  }

  test("WebDataset explode: stems group members, per-stem counts ride along") {
    import spark.implicits._
    val shard = Archives.encodeTar(Seq(
      ("s0.txt", "t0".getBytes), ("s0.json", "j0".getBytes),
      ("s0.cls", "0".getBytes),
      ("s1.txt", "t1".getBytes), ("s1.json", "j1".getBytes)))
    val rows = Archives.explodeTarSamples(
      Seq((3L, shard)).toDF("media_id", "payload"))
      .collect().sortBy(_.entry)
    assert(rows.map(r => (r.stem, r.entry, r.n_in_sample)).toSeq == Seq(
      ("s0", "s0.cls", 3L), ("s0", "s0.json", 3L), ("s0", "s0.txt", 3L),
      ("s1", "s1.json", 2L), ("s1", "s1.txt", 2L)))
    assert(rows.find(_.entry == "s0.txt").get.body_md5 == md5hex("t0"))
  }

  test("one digest handle per 64-payload batch (the BatchedDecode seam)") {
    import spark.implicits._
    val media = spark.range(200).as[Long]
      .map(id => (id, Archives.encodeZip(
        Seq((s"e.txt", s"body-$id".getBytes("UTF-8"))))))
      .toDF("media_id", "payload").repartition(1)
    ArchivesSpec.opened.set(0)
    val n = Archives.explodeZipStats(media, 64, () => {
      ArchivesSpec.opened.incrementAndGet()
      java.security.MessageDigest.getInstance("MD5")
    }).count()
    assert(n == 200)
    assert(ArchivesSpec.opened.get() == 4,
      s"expected 4 digest opens for 200/64, got ${ArchivesSpec.opened.get()}")
  }
}

/** JVM-wide probe counter (local[*] shares the JVM with executors). */
object ArchivesSpec {
  val opened = new AtomicInteger(0)
}
