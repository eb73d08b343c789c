package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Tfrecord]] (q154) — TFRecord framing (masked CRC32C) + protobuf
  * wire-format walk.
  */
class TfrecordSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x").mkString

  test("shard round-trip: lengths, field values, digests") {
    val bodies = Seq(
      (0L, "tiny".getBytes("UTF-8")),
      (127L, ("x" * 127).getBytes("UTF-8")),      // 1-byte varint rail
      (128L, ("y" * 128).getBytes("UTF-8")),      // 2-byte varint rail
      (300000L, ("z" * 200).getBytes("UTF-8")))
    val shard = Tfrecord.encodeShard(
      bodies.map { case (f1, b) => Tfrecord.encodeExample(f1, b) })
    val rows = Tfrecord.walk(9L, shard).get
    assert(rows.map(_.rec) === Vector(0L, 1L, 2L, 3L))
    assert(rows.map(_.f1) === bodies.map(_._1).toVector)
    assert(rows.map(_.f2_md5) === bodies.map(b => md5hex(b._2)).toVector)
    assert(rows.forall(_.n_records == 4L))
    // the n_bytes arithmetic the oracle mirrors: 2 tag bytes +
    // varint widths + body
    def vlen(v: Long): Long =
      if (v < 128) 1 else if (v < 16384) 2 else if (v < 2097152) 3
      else if (v < 268435456) 4 else 5
    for ((r, (f1, b)) <- rows.zip(bodies))
      assert(r.n_bytes === 2 + vlen(f1) + vlen(b.length.toLong) + b.length)
  }

  test("masked CRC follows the TF/LevelDB rule") {
    // rot15 + delta over CRC32C; pin one vector so the mask can't
    // silently change: crc32c("123456789") = 0xe3069283
    val v = Tfrecord.maskedCrc("123456789".getBytes, 0, 9)
    val crc = 0xe3069283L
    val exp = (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL
    assert(v === exp)
  }

  test("corruption anywhere quarantines the whole shard") {
    val good = Tfrecord.encodeShard(Seq(
      Tfrecord.encodeExample(1L, "record one".getBytes),
      Tfrecord.encodeExample(2L, "record two".getBytes)))
    assert(Tfrecord.walk(0L, good).isDefined)
    val bumpLen = good.clone(); bumpLen(0) = (bumpLen(0) + 1).toByte
    assert(Tfrecord.walk(0L, bumpLen).isEmpty, "length CRC must catch")
    val flipBody = good.clone(); flipBody(14) = (flipBody(14) ^ 1).toByte
    assert(Tfrecord.walk(0L, flipBody).isEmpty, "data CRC must catch")
    assert(Tfrecord.walk(0L, good.dropRight(2)).isEmpty, "truncation")
    assert(Tfrecord.walk(0L, good :+ 0x00.toByte).isEmpty, "trailing garbage")
    assert(Tfrecord.walk(0L, Array.empty[Byte]).isEmpty)
  }

  test("unknown protobuf fields are skipped, missing required reject") {
    // field 3 varint prepended: 0x18, value 5 — walk must skip it
    val base = Tfrecord.encodeExample(7L, "body".getBytes)
    val extra = Array[Byte](0x18, 5) ++ base
    val rows = Tfrecord.walk(0L,
      Tfrecord.encodeShard(Seq(extra))).get
    assert(rows.head.f1 === 7L)
    // a payload with only field 3 lacks both required fields
    val only3 = Array[Byte](0x18, 5)
    assert(Tfrecord.walk(0L, Tfrecord.encodeShard(Seq(only3))).isEmpty)
  }

  test("overlong/overflowing varints are malformed, never truncated") {
    val f2 = Array[Byte](0x12, 4) ++ "body".getBytes("UTF-8")
    def f1Varint(last: Byte) =
      Array[Byte](0x08) ++ Array.fill[Byte](9)(0x80.toByte) :+ last
    // 10th byte at shift 63 with a bit above the LSB: the old walk
    // silently dropped those bits; it must reject as malformed
    assert(Tfrecord.walk(0L, Tfrecord.encodeShard(
      Seq(f1Varint(0x02) ++ f2))).isEmpty, "overflow bit truncated")
    assert(Tfrecord.walk(0L, Tfrecord.encodeShard(
      Seq(f1Varint(0x7f) ++ f2))).isEmpty, "six overflow bits")
    // an 11th byte (continuation at shift 63) is likewise malformed
    assert(Tfrecord.walk(0L, Tfrecord.encodeShard(
      Seq(Array[Byte](0x08) ++ Array.fill[Byte](10)(0x80.toByte) ++
        Array[Byte](0x00) ++ f2))).isEmpty)
    // boundary: a 10-byte varint whose final byte adds NO bits above
    // bit 63 still parses (overlong-of-zero, tolerated; only bit
    // LOSS is malformed)
    val ok = Tfrecord.walk(0L, Tfrecord.encodeShard(
      Seq(f1Varint(0x00) ++ f2))).get
    assert(ok.head.f1 === 0L)
  }
}
