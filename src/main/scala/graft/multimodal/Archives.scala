package graft.multimodal

import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** One extracted archive member ([[Archives.explodeZipStats]]):
  * the entry's name, its decompressed size, the compression method
  * the CONTAINER declared (`stored`/`deflated` — read back from the
  * entry header, so a writer that silently flips method is caught),
  * and the md5 of the decompressed bytes (portable to the DuckDB
  * oracle's `md5()`).
  */
case class ZipEntryRow(media_id: Long, entry: String, n_bytes: Long,
    method: String, body_md5: String)

/** Archive-shard handling: training corpora arrive as ARCHIVES of
  * members (tar/zip shards of documents, WARC segments), and the
  * ingest boundary is "explode the container into per-member rows
  * without materializing the whole archive anywhere". The JDK ships
  * a complete ZIP codec (`java.util.zip` — both the container walk
  * and the DEFLATE codec), so unlike image/audio this path is fully
  * real end-to-end: real container, real per-entry inflate, both
  * STORED and DEFLATED methods on gate data.
  *
  * Scale posture (the [[BatchedDecode]] seam): payloads stream
  * through each partition in fixed-size batches with one digest
  * handle per batch, entries are read STREAMING (one entry's bytes
  * in memory at a time, never the inflated archive), and the output
  * is compact typed rows — name, size, method, digest — never member
  * bodies. Malformed containers are dropped (quarantine sink in
  * production). At 100 TB the archive column stays opaque in the
  * scan until this boundary, and nothing downstream re-shuffles it.
  */
object Archives {

  /** Extract one batch with an already-opened digest handle. */
  private def explodeBatch(md: java.security.MessageDigest,
      batch: Seq[(Long, Array[Byte])]): Iterator[ZipEntryRow] = {
    batch.iterator.flatMap { case (id, payload) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntryRow]
      val zin = new ZipInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val buf = new Array[Byte](8192)
        var entry = zin.getNextEntry
        while (entry != null) {
          md.reset()
          var n = 0L
          var read = zin.read(buf)
          while (read >= 0) {
            md.update(buf, 0, read)
            n += read
            read = zin.read(buf)
          }
          val method = entry.getMethod match {
            case ZipEntry.STORED => "stored"
            case ZipEntry.DEFLATED => "deflated"
            case other => s"method_$other"
          }
          out += ZipEntryRow(id, entry.getName, n, method,
            md.digest().map(b => f"$b%02x").mkString)
          entry = zin.getNextEntry
        }
        out.iterator
      } catch {
        // a container whose walk throws mid-entry is dropped WHOLE:
        // half an archive is worse than none for exactly-once ingest.
        // NonFatal, not just ZipException/IOException: getNextEntry
        // also throws IllegalArgumentException for entry names that
        // are not valid UTF-8 (legacy-charset archives without the
        // UTF-8 flag) — any decode failure is quarantine, never a
        // task kill
        case scala.util.control.NonFatal(_) => Iterator.empty
      } finally zin.close()
    }
  }

  /** Explode archive payloads (`media_id`, `payload`) into per-entry
    * rows through the one-handle-per-batch seam. Narrow: no shuffle,
    * payloads never leave their input partition.
    */
  def explodeZipStats(media: DataFrame,
      batchSize: Int = BatchedDecode.DefaultBatch,
      newDigest: () => java.security.MessageDigest =
        () => java.security.MessageDigest.getInstance("MD5"))
      : Dataset[ZipEntryRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(
        _.grouped(batchSize).flatMap(b => explodeBatch(newDigest(), b)))
  }

  /** Strict whole-archive ZIP walk for the streaming shard ingest:
    * Some(name, n_bytes, method, body_md5 per entry) or None on ANY
    * failure — quarantine-WHOLE, unlike [[explodeZipStats]]'s
    * drop-silently batch posture (a standing service must NAME its
    * poison shards). A payload without the local-file-header magic
    * is None, not Some(empty): `ZipInputStream.getNextEntry` returns
    * null on arbitrary garbage rather than throwing, which would
    * read as a legitimately empty archive. Detection boundary: a
    * truncation that clips only the CENTRAL DIRECTORY is invisible
    * to a streaming walk (every entry's data + CRC verified; the
    * directory is never consulted) — such a shard ingests, which is
    * correct for the data actually present; a mid-entry truncation
    * throws and quarantines.
    */
  def zipEntriesStrict(payload: Array[Byte],
      maxBytes: Long = 1L << 26)
      : Option[Vector[(String, Long, String, String)]] =
    zipEntriesDetail(payload, maxBytes).toOption

  /** [[zipEntriesStrict]] with the failure NAMED: Left("too_large")
    * when the cumulative decompressed size exceeds `maxBytes` (a
    * legitimately large shard — common for real WARC/WebDataset
    * shards past the default 64 MiB — is distinguishable from a
    * corrupt one and re-ingestable with a raised cap), Left
    * ("checksum_or_framing") for every genuine malformation.
    */
  def zipEntriesDetail(payload: Array[Byte],
      maxBytes: Long = 1L << 26)
      : Either[String, Vector[(String, Long, String, String)]] = {
    val Bad = Left("checksum_or_framing")
    if (payload.length < 4 || payload(0) != 'P' || payload(1) != 'K' ||
      payload(2) != 3 || payload(3) != 4) return Bad
    val out = Vector.newBuilder[(String, Long, String, String)]
    val zin = new ZipInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](8192)
      var total = 0L
      var entry = zin.getNextEntry
      if (entry == null) return Bad // magic present but no walkable entry
      while (entry != null) {
        md.reset()
        var n = 0L
        var read = zin.read(buf)
        while (read >= 0) {
          md.update(buf, 0, read); n += read; total += read
          // decompression-bomb bound (GzipMembers.walk's cap): a
          // kB-sized DEFLATE entry can inflate ~1000:1, and a
          // standing ingest must quarantine the bomb early, not
          // stream-and-discard gigabytes per poisoned shard. The cap
          // is cumulative over the WHOLE archive's decompressed
          // bytes, so the reason is its own so callers can tell an
          // oversized-but-valid shard from a corrupt one.
          if (total > maxBytes) return Left("too_large")
          read = zin.read(buf)
        }
        val method = entry.getMethod match {
          case ZipEntry.STORED => "stored"
          case ZipEntry.DEFLATED => "deflated"
          case other => s"method_$other"
        }
        out += ((entry.getName, n, method,
          md.digest().map(b => f"$b%02x").mkString))
        entry = zin.getNextEntry
      }
      Right(out.result())
    } catch {
      case scala.util.control.NonFatal(_) => Bad
    } finally zin.close()
  }

  /** Strict whole-archive walk with BODIES and the declared method —
    * the decoded-member boundary for container-front curation (q160):
    * unlike the stats walks, curation must carry each member's text
    * onward. Same posture as [[zipEntriesStrict]]: PK-magic check,
    * quarantine-whole None on any failure, cumulative decompressed-
    * size cap. Memory is one archive's decompressed members at a time
    * (bounded by `maxBytes`), which is the explode boundary's
    * documented working set.
    */
  def zipMembersFull(payload: Array[Byte], maxBytes: Long = 1L << 26)
      : Option[Vector[(String, String, Array[Byte])]] = {
    if (payload.length < 4 || payload(0) != 'P' || payload(1) != 'K' ||
      payload(2) != 3 || payload(3) != 4) return None
    val out = Vector.newBuilder[(String, String, Array[Byte])]
    val zin = new ZipInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val buf = new Array[Byte](8192)
      var total = 0L
      var entry = zin.getNextEntry
      if (entry == null) return None
      while (entry != null) {
        val body = new java.io.ByteArrayOutputStream()
        var read = zin.read(buf)
        while (read >= 0) {
          body.write(buf, 0, read); total += read
          if (total > maxBytes) return None
          read = zin.read(buf)
        }
        val method = entry.getMethod match {
          case ZipEntry.STORED => "stored"
          case ZipEntry.DEFLATED => "deflated"
          case other => s"method_$other"
        }
        out += ((entry.getName, method, body.toByteArray))
        entry = zin.getNextEntry
      }
      Some(out.result())
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally zin.close()
  }

  /** The member body planted for (archive id, entry j) — closed-form
    * in the ids so the DuckDB oracle rebuilds it with `repeat()`:
    * "doc <id> entry <j> " repeated 1 + (id+j) % 5 times.
    */
  def plantedBody(id: Long, j: Long): String =
    s"doc $id entry $j " * (1 + ((id + j) % 5)).toInt

  /** Write a canonical ZIP with the given entries; even-indexed
    * entries DEFLATED, odd-indexed STORED (STORED requires size +
    * CRC-32 declared up front — the second real codepath a reader
    * must handle).
    */
  def encodeZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.zipWithIndex.foreach { case ((name, body), i) =>
      val e = new ZipEntry(name)
      if (i % 2 == 1) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(body.length.toLong)
        val crc = new CRC32(); crc.update(body)
        e.setCrc(crc.getValue)
      } else e.setMethod(ZipEntry.DEFLATED)
      zos.putNextEntry(e)
      zos.write(body)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Media table of REAL ZIP payloads, closed-form in doc_id: each
    * doc becomes an archive of 2 + id%3 members named `e<j>.txt`,
    * bodies from [[plantedBody]], methods alternating
    * DEFLATED/STORED by member index. Narrow, one pass.
    */
  def zipMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.ScanFanOut(docs).select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val k = (2 + id % 3).toInt
        (id, encodeZip((0 until k).map(j =>
          (s"e$j.txt", plantedBody(id, j.toLong).getBytes("UTF-8")))))
      }
      .toDF("media_id", "payload")
  }

  // ---- tar (POSIX ustar) — the WebDataset shard container ----

  /** One extracted tar member with its WebDataset grouping key: the
    * STEM (name up to the first '.') groups the members of one
    * training sample (stem.jpg + stem.json + stem.cls in real
    * shards); `n_in_sample` counts the stem's members so downstream
    * can reject incomplete samples without re-reading the shard.
    */
  final case class TarEntryRow(media_id: Long, stem: String,
      entry: String, n_bytes: Long, body_md5: String,
      n_in_sample: Long)

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    var seen = false
    val end = off + len
    // POSIX permits LEADING space padding on numeric fields (BSD-
    // lineage writers right-justify chksum with spaces); skip it —
    // a space after digits still terminates
    while (i < end && b(i) == ' ') i += 1
    while (i < end && b(i) != 0 && b(i) != ' ') {
      if (b(i) < '0' || b(i) > '7') return None
      v = v * 8 + (b(i) - '0'); seen = true; i += 1
    }
    if (seen) Some(v) else None
  }

  /** Walk a ustar payload into (name, dataOffset, size) member
    * descriptors — the copy-FREE core: consumers digest/read member
    * bytes in place from the payload array, so per-payload memory is
    * the payload itself plus descriptors, never a second copy of
    * every member (the 512 MB-shard case the batch seam exists for).
    * None on any malformation. Real-format strictness where it
    * matters: the header CHECKSUM is verified (sum of header bytes
    * with the chksum field read as spaces — the field every tar
    * writer computes and corrupted shards fail), sizes are octal
    * (leading-space padding accepted), member data pads to 512-byte
    * blocks, and the archive ends at the first all-zero block. Only
    * regular files (typeflag '0' or NUL) are emitted; directories
    * and extension headers are skipped by their declared size like
    * any tar reader.
    */
  def tarMembers(b: Array[Byte]): Option[Seq[(String, Int, Int)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var pos = 0
    while (pos + 512 <= b.length) {
      if ((pos until pos + 512).forall(b(_) == 0))
        return Some(out.toSeq) // end-of-archive marker
      // verify the header checksum before trusting any field
      val declared = octal(b, pos + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else b(pos + i) & 0xff)
        i += 1
      }
      if (sum != declared) return None
      var nameEnd = pos
      while (nameEnd < pos + 100 && b(nameEnd) != 0) nameEnd += 1
      val name = new String(b, pos, nameEnd - pos, "US-ASCII")
      if (name.isEmpty) return None
      val size = octal(b, pos + 124, 12).getOrElse(return None)
      if (size < 0 || size > Int.MaxValue) return None
      val typeflag = b(pos + 156)
      val dataStart = pos + 512
      val padded = ((size + 511) / 512) * 512
      if (dataStart + size > b.length) return None
      if (typeflag == '0' || typeflag == 0)
        out += ((name, dataStart, size.toInt))
      pos = dataStart + padded.toInt
    }
    // a shard truncated before its end-of-archive marker is malformed
    None
  }

  /** [[tarMembers]] with the bodies materialized — the small-archive
    * convenience (specs, fixtures); the streaming explode path uses
    * the descriptor form directly.
    */
  def decodeTar(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] =
    tarMembers(b).map(_.map { case (name, off, len) =>
      (name, java.util.Arrays.copyOfRange(b, off, off + len))
    })

  /** Write a canonical ustar archive (regular files, correct octal
    * checksum, ustar magic, 512-block padding, two-zero-block end).
    */
  def encodeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, body) =>
      require(name.length < 100, s"name too long: $name")
      val hdr = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(hdr, 0)
      f"${0x1a4}%07o".getBytes.copyToArray(hdr, 100) // mode 0644
      "0000000".getBytes.copyToArray(hdr, 108) // uid
      "0000000".getBytes.copyToArray(hdr, 116) // gid
      f"${body.length}%011o".getBytes.copyToArray(hdr, 124)
      "00000000000".getBytes.copyToArray(hdr, 136) // mtime
      hdr(156) = '0' // regular file
      "ustar".getBytes.copyToArray(hdr, 257)
      hdr(263) = '0'; hdr(264) = '0' // version "00"
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      hdr.foreach(x => sum += (x & 0xff))
      f"$sum%06o".getBytes.copyToArray(hdr, 148)
      hdr(154) = 0; hdr(155) = ' '
      bos.write(hdr)
      bos.write(body)
      val pad = ((body.length + 511) / 512) * 512 - body.length
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024)) // end-of-archive
    bos.toByteArray
  }

  /** Explode WebDataset-style tar shards into per-member rows with
    * the stem grouping and per-stem member counts computed INSIDE
    * the batch worker (the shard's members are already co-located in
    * one payload — counting them there costs nothing and saves the
    * downstream a (media_id, stem) shuffle). Same seam and drop
    * semantics as [[explodeZipStats]].
    */
  def explodeTarSamples(media: DataFrame,
      batchSize: Int = BatchedDecode.DefaultBatch,
      newDigest: () => java.security.MessageDigest =
        () => java.security.MessageDigest.getInstance("MD5"))
      : Dataset[TarEntryRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        val md = newDigest()
        batch.iterator.flatMap { case (id, payload) =>
          tarMembers(payload) match {
            case None => Iterator.empty
            case Some(members) =>
              // digest IN PLACE from the payload array — member
              // bodies are never copied out (tarMembers' contract)
              val stemCounts = members
                .groupMapReduce(_._1.takeWhile(_ != '.'))(_ => 1L)(_ + _)
              members.iterator.map { case (name, off, len) =>
                md.reset()
                md.update(payload, off, len)
                val stem = name.takeWhile(_ != '.')
                TarEntryRow(id, stem, name, len.toLong,
                  md.digest().map(x => f"$x%02x").mkString,
                  stemCounts(stem))
              }
          }
        }
      })
  }

  /** Media table of REAL WebDataset-style tar shards, closed-form in
    * doc_id: each doc becomes a shard of 1 + id%2 samples; sample j
    * carries members `s<j>.txt` and `s<j>.json` (bodies from
    * [[plantedBody]] at j*2 and j*2+1), plus a `.cls` member when
    * (id+j) is even — so per-stem member counts vary 2/3 closed-form.
    */
  def tarMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.ScanFanOut(docs).select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val samples = (0 until (1 + id % 2).toInt).flatMap { j =>
          val base = Seq(
            (s"s$j.txt", plantedBody(id, j * 2L).getBytes("UTF-8")),
            (s"s$j.json", plantedBody(id, j * 2L + 1).getBytes("UTF-8")))
          if ((id + j) % 2 == 0)
            base :+ ((s"s$j.cls", s"$j".getBytes("UTF-8")))
          else base
        }
        (id, encodeTar(samples))
      }
      .toDF("media_id", "payload")
  }
}
