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
        // half an archive is worse than none for exactly-once ingest
        case _: java.util.zip.ZipException | _: java.io.IOException =>
          Iterator.empty
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
    docs.select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val k = (2 + id % 3).toInt
        (id, encodeZip((0 until k).map(j =>
          (s"e$j.txt", plantedBody(id, j.toLong).getBytes("UTF-8")))))
      }
      .toDF("media_id", "payload")
  }
}
