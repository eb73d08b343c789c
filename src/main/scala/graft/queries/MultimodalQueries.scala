package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps._

/** Multimodal-column queries (SURVEY.md §2.11): the payloads are
  * synthesized from `documents` with closed-form header fields, so a
  * DuckDB oracle can verify the whole binary round-trip (encode ->
  * header parse -> byte-range frame sampling -> md5 features) without
  * any binary support on the oracle side.
  */
object MultimodalQueries {

  import Relational.tbl

  // ---- q50: encode -> decode metadata round-trip + metadata resize ----
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaFromDocuments(tbl(spark, dir, "documents"))
      .withColumn("meta", decodeMeta(col("payload")))
    media.select(
      col("media_id"),
      col("meta.kind").as("kind"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"),
      col("meta.body_bytes").as("body_bytes"),
      resizeMeta(col("meta"), 32).getField("width").as("resized_w"),
      resizeMeta(col("meta"), 32).getField("height").as("resized_h"))
      .orderBy(col("media_id"))
  }

  val q50Sql: String =
    """SELECT doc_id AS media_id,
      |  doc_id % 3 AS kind,
      |  64 + doc_id % 64 AS width,
      |  48 + doc_id % 48 AS height,
      |  1 + doc_id % 30 AS n_frames,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes,
      |  CAST(floor((64 + doc_id % 64) *
      |    (32.0 / greatest(64 + doc_id % 64, 48 + doc_id % 48))) AS BIGINT) AS resized_w,
      |  CAST(floor((48 + doc_id % 48) *
      |    (32.0 / greatest(64 + doc_id % 64, 48 + doc_id % 48))) AS BIGINT) AS resized_h
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q51: frame sampling + feature extraction for video payloads ----
  // ASCII guard (octet_length == char length): DuckDB cannot md5/slice
  // BLOBs, so the oracle slices characters; restricting both engines
  // to byte==char documents makes the comparison exact by
  // construction rather than by fixture luck.
  def q51(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaFromDocuments(tbl(spark, dir, "documents")
        .filter(octet_length(col("text")) === length(col("text"))))
      .filter(col("kind_id") === 2)
      .withColumn("frames", sampleFrames(col("payload"), 16, 4))
      .withColumn("feats", frameFeaturesStub(col("frames")))
    media.select(col("media_id"), posexplode(col("feats")))
      .select(
        col("media_id"),
        col("pos").cast("long").as("frame_idx"),
        col("col").getItem(0).as("f0"),
        col("col").getItem(1).as("f1"),
        col("col").getItem(2).as("f2"),
        col("col").getItem(3).as("f3"))
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's map stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val q51Sql: String = {
    val nib = (c: String) => s"(strpos('0123456789abcdef', $c) - 1)"
    def feat(s: Int) = {
      val cs = (0 until 4).map(j => nib(s"substr(h, ${s * 4 + j + 1}, 1)"))
      s"CAST(${cs(0)} * 4096 + ${cs(1)} * 256 + ${cs(2)} * 16 + ${cs(3)} AS BIGINT)"
    }
    s"""WITH v AS (
       |  SELECT doc_id AS media_id, text,
       |    least(octet_length(encode(text)) // 16, 4) AS nf
       |  FROM documents
       |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) = length(text)
       |), f AS (
       |  SELECT media_id, u.f AS frame_idx,
       |    md5(substr(text, 1 + u.f * 16, 16)) AS h
       |  FROM v, UNNEST(range(0, CAST(nf AS BIGINT))) AS u(f)
       |)
       |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  ${feat(0)} AS f0, ${feat(1)} AS f1, ${feat(2)} AS f2, ${feat(3)} AS f3
       |FROM f ORDER BY media_id, frame_idx""".stripMargin
  }

  // ---- q59: batched decode (mapPartitions worker, typed output) ----
  // The mapInPandas-equivalent boundary: payloads decoded in 64-item
  // batches with one codec handle per batch (BatchedDecode), header
  // parsed from raw bytes in JVM code — a second, independent
  // implementation of the header layout, so the oracle cross-checks
  // MultimodalOps' column-expression encode against it bit-for-bit.
  // The stubbed luminance is md5-of-body % 10000, portable to DuckDB.
  def q59(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeBatched(mediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's whole decode stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))

  val q59Sql: String = {
    // first 15 md5 hex digits of `text` as a BIGINT (shared Horner
    // helper — the same decoding every md5_long60 oracle uses), % 10000
    val h = TextQueries.md5IntSql("text")
    s"""SELECT doc_id AS media_id, doc_id % 3 AS kind,
       |  64 + doc_id % 64 AS width, 48 + doc_id % 48 AS height,
       |  1 + doc_id % 30 AS n_frames,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes,
       |  CAST($h % 10000 AS BIGINT) AS luma_e4
       |FROM documents ORDER BY media_id""".stripMargin
  }

  // ---- q129: REAL pixel/sample decode (PGM + WAV, pure JVM) ----
  // The round-12 close of the one honest capability stub: kind-0
  // docs are planted as REAL binary PGM images and kind-1 docs as
  // REAL PCM16 mono WAVs (Codecs.encodePgm/encodeWav, closed-form
  // rasters/samples in doc_id), then decoded back by content
  // sniffing through the SAME one-handle-per-batch seam as q59
  // (BatchedDecode.decodeStats). The decoded statistics — pixel
  // sum/min/max, abs-amplitude sum and raw sample extremes — are
  // recomputed closed-form by the DuckDB oracle from doc_id alone,
  // so a single flipped byte anywhere in encoder, header parse,
  // raster walk, or sample arithmetic hash-fails the gate. Kind-2
  // docs stay in the synthetic 'GM' container and take the md5
  // fallback route (fmt='gm' rows — the residual stub, visibly
  // labeled), proving unknown-format routing alongside the real
  // decodes.
  //
  // 100 TB posture: identical to q59 — narrow decode, payloads never
  // shuffled, one codec handle per 64-payload batch, compact typed
  // rows out; only the final oracle orderBy exchanges.
  def q129(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeStats(codecMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"))

  val q129Sql: String = {
    // coalesce: NULL text is an EMPTY body on the Spark side (see
    // codecMediaFromDocuments), so the oracle digests '' too
    val h = TextQueries.md5IntSql("coalesce(text, '')")
    s"""WITH img AS (
       |  SELECT doc_id AS media_id, 'pgm' AS fmt,
       |    16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h,
       |    (16 + doc_id % 16) * (8 + doc_id % 8) AS n_units,
       |    list_transform(range(0, CAST((16 + doc_id % 16) * (8 + doc_id % 8) AS BIGINT)),
       |      i -> (doc_id * 31 + i * 7) % 256) AS px
       |  FROM documents WHERE doc_id % 3 = 0
       |), wav AS (
       |  SELECT doc_id AS media_id, 'wav' AS fmt,
       |    8000 + (doc_id % 8) * 1000 AS w, 1 AS h,
       |    64 + doc_id % 128 AS n_units,
       |    list_transform(range(0, CAST(64 + doc_id % 128 AS BIGINT)),
       |      i -> ((doc_id * 131 + i * 17) % 4097) - 2048) AS smp
       |  FROM documents WHERE doc_id % 3 = 1
       |)
       |SELECT media_id, fmt, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       |  CAST(n_units AS BIGINT) AS n_units,
       |  CAST(list_sum(px) AS BIGINT) AS sum_val,
       |  CAST(list_min(px) AS BIGINT) AS min_val,
       |  CAST(list_max(px) AS BIGINT) AS max_val,
       |  CAST(list_sum(list_transform(range(0, CAST(n_units AS BIGINT)),
       |    i -> i * px[i + 1])) AS BIGINT) AS wsum_val
       |FROM img
       |UNION ALL
       |SELECT media_id, fmt, CAST(w AS BIGINT), CAST(h AS BIGINT),
       |  CAST(n_units AS BIGINT),
       |  CAST(list_sum(list_transform(smp, s -> abs(s))) AS BIGINT),
       |  CAST(list_min(smp) AS BIGINT),
       |  CAST(list_max(smp) AS BIGINT),
       |  CAST(list_sum(list_transform(range(0, CAST(n_units AS BIGINT)),
       |    i -> i * abs(smp[i + 1]))) AS BIGINT)
       |FROM wav
       |UNION ALL
       |SELECT doc_id AS media_id, 'gm' AS fmt,
       |  CAST(64 + doc_id % 64 AS BIGINT), CAST(48 + doc_id % 48 AS BIGINT),
       |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT),
       |  CAST($h % 10000 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |  CAST(0 AS BIGINT)
       |FROM documents WHERE doc_id % 3 = 2
       |ORDER BY media_id""".stripMargin
  }

  // ---- q130: REAL compressed-format decode (PNG, pure JVM) ----
  // The step past q129's uncompressed formats: PNG payloads planted
  // with closed-form rasters (gray / RGB / RGBA by doc_id % 3, the
  // scanline filter cycling (id + y) % 5 so None/Sub/Up/Average/
  // Paeth all reconstruct on gate data), decoded back through the
  // same one-handle-per-batch seam — CRC-32 chunk verification, JDK
  // zlib inflate, per-scanline filter reconstruction, integer-luma
  // gray reduction — and hash-matched against a DuckDB oracle that
  // recomputes sum/min/max from doc_id alone. Text never enters the
  // planting, so the query replays identically at any SF or replica.
  //
  // 100 TB posture: identical to q59/q129 — narrow decode, payloads
  // never shuffled, compact typed rows out; only the final oracle
  // orderBy exchanges.
  def q130(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeStats(pngMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"))

  val q130Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id,
      |    16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h,
      |    CASE WHEN media_id % 3 = 0 THEN
      |      list_transform(range(0, CAST(w * h AS BIGINT)),
      |        i -> (media_id * 37 + i * 11) % 256)
      |    ELSE
      |      list_transform(range(0, CAST(w * h AS BIGINT)),
      |        i -> ((media_id * 13 + i * 3) % 256 * 299
      |            + (media_id * 17 + i * 5) % 256 * 587
      |            + (media_id * 19 + i * 7) % 256 * 114) // 1000)
      |    END AS v
      |  FROM g
      |)
      |SELECT media_id, 'png' AS fmt,
      |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  CAST(w * h AS BIGINT) AS n_units,
      |  CAST(list_sum(v) AS BIGINT) AS sum_val,
      |  CAST(list_min(v) AS BIGINT) AS min_val,
      |  CAST(list_max(v) AS BIGINT) AS max_val,
      |  CAST(list_sum(list_transform(range(0, CAST(w * h AS BIGINT)),
      |    i -> i * v[i + 1])) AS BIGINT) AS wsum_val
      |FROM px ORDER BY media_id""".stripMargin

  // ---- q133: REAL BMP decode (24-bit BI_RGB, pure JVM) ----
  // The Windows-DIB member of the decoder family, and the reason the
  // whole family now carries the ORDER-SENSITIVE wsum statistic
  // (Σ i * value(i) in image order): BMP's quirks — BGR channel
  // order, BOTTOM-UP row storage under positive biHeight (alternated
  // with top-down negative-biHeight payloads by id parity), 4-byte
  // row padding — all produce the right value MULTISET when botched,
  // so sum/min/max alone could green a decoder that reads every row
  // upside down. The oracle recomputes sum/min/max/wsum closed-form
  // from doc_id (integer-luma reduction, as q130); planting never
  // reads `text`, so the query replays at any SF/replica.
  //
  // 100 TB posture: identical to q129/q130 — narrow decode through
  // the one-handle-per-batch seam, payloads never shuffled, compact
  // typed rows out; only the final oracle orderBy exchanges.
  def q133(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeStats(bmpMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's map stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))

  val q133Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id,
      |    16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h,
      |    list_transform(range(0, CAST(w * h AS BIGINT)),
      |      i -> ((media_id * 23 + i * 3) % 256 * 299
      |          + (media_id * 29 + i * 5) % 256 * 587
      |          + (media_id * 31 + i * 7) % 256 * 114) // 1000) AS v
      |  FROM g
      |)
      |SELECT media_id, 'bmp' AS fmt,
      |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  CAST(w * h AS BIGINT) AS n_units,
      |  CAST(list_sum(v) AS BIGINT) AS sum_val,
      |  CAST(list_min(v) AS BIGINT) AS min_val,
      |  CAST(list_max(v) AS BIGINT) AS max_val,
      |  CAST(list_sum(list_transform(range(0, CAST(w * h AS BIGINT)),
      |    i -> i * v[i + 1])) AS BIGINT) AS wsum_val
      |FROM px ORDER BY media_id""".stripMargin

  // ---- q138: REAL entropy-coded decode (JPEG via JDK ImageIO) ----
  // The close of the decoder family's last capability stub: payloads
  // are REAL JPEGs — Huffman entropy decode, dequantization, and the
  // IDCT run in the JDK's bundled libjpeg (java.desktop's ImageIO
  // plugin), not a stand-in. A lossy codec can't normally be oracled
  // closed-form, so planting pins the one regime where the round
  // trip is EXACT: per-8x8-block-constant grayscale at quality 1.0
  // (all AC coefficients identically zero, unit quant tables —
  // JpegSpec proves decode(encode(v)) == v for all 256 gray levels).
  // The oracle recomputes sum/min/max and the order-sensitive wsum
  // from doc_id alone; blocks differ from each other, so a permuted
  // block walk hash-fails. fmt='gm' now remains only for formats
  // with no in-sandbox codec at all (video containers).
  //
  // 100 TB posture: identical to q129/q130/q133 — narrow decode
  // through the one-reader-handle-per-batch seam (the ImageIO reader
  // is reused across the batch's payloads and disposed at batch
  // end), payloads never shuffled, compact typed rows out; only the
  // final oracle orderBy exchanges.
  def q138(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeStats(jpegMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's whole decode stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))

  val q138Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id,
      |    16 + (doc_id % 3) * 8 AS w, 8 + (doc_id % 2) * 8 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h,
      |    list_transform(range(0, CAST(w * h AS BIGINT)),
      |      i -> (media_id * 41 +
      |            (((i // w) // 8) * (w // 8) + ((i % w) // 8)) * 59)
      |           % 256) AS v
      |  FROM g
      |)
      |SELECT media_id, 'jpg' AS fmt,
      |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  CAST(w * h AS BIGINT) AS n_units,
      |  CAST(list_sum(v) AS BIGINT) AS sum_val,
      |  CAST(list_min(v) AS BIGINT) AS min_val,
      |  CAST(list_max(v) AS BIGINT) AS max_val,
      |  CAST(list_sum(list_transform(range(0, CAST(w * h AS BIGINT)),
      |    i -> i * v[i + 1])) AS BIGINT) AS wsum_val
      |FROM px ORDER BY media_id""".stripMargin

  // ---- q136: archive-shard explode (real ZIP, pure JVM) ----
  // Training corpora arrive as archives of members (tar/zip shards,
  // WARC segments); the ingest boundary explodes each container into
  // per-member rows without materializing the inflated archive. The
  // JDK ships the COMPLETE zip codec, so this path is fully real:
  // container walk via ZipInputStream, per-entry DEFLATE inflate,
  // and both methods on gate data (members alternate DEFLATED /
  // STORED by index — STORED declares size+CRC up front, the second
  // header layout a reader must handle). Output per member: name,
  // decompressed size, the method READ BACK from the entry header,
  // and the body md5 — recomputed closed-form by the DuckDB oracle
  // (repeat() rebuilds each planted body from the ids). Planting
  // never reads `text`; replays at any SF/replica.
  //
  // 100 TB posture: the BatchedDecode seam — archives stream through
  // partitions in 64-payload batches, one digest handle per batch,
  // one member's bytes in memory at a time, compact typed rows out;
  // only the final oracle orderBy exchanges.
  def q136(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Archives
      .explodeZipStats(
        graft.multimodal.Archives.zipMediaFromDocuments(
          tbl(spark, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"), col("entry"))

  val q136Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id, u.j
      |  FROM documents,
      |    unnest(range(0, CAST(2 + doc_id % 3 AS BIGINT))) AS u(j)
      |), e AS (
      |  SELECT media_id,
      |    'e' || CAST(j AS VARCHAR) || '.txt' AS entry,
      |    repeat('doc ' || CAST(media_id AS VARCHAR) || ' entry ' ||
      |      CAST(j AS VARCHAR) || ' ',
      |      CAST(1 + (media_id + j) % 5 AS BIGINT)) AS body,
      |    CASE WHEN j % 2 = 0 THEN 'deflated' ELSE 'stored' END
      |      AS method
      |  FROM g
      |)
      |SELECT media_id, entry,
      |  CAST(octet_length(encode(body)) AS BIGINT) AS n_bytes,
      |  method, md5(body) AS body_md5
      |FROM e ORDER BY media_id, entry""".stripMargin

  // ---- q137: WebDataset-style tar shard explode (real ustar) ----
  // Multimodal training corpora ship as TAR shards whose members
  // group into samples by name stem (stem.jpg + stem.json +
  // stem.cls — the WebDataset convention); the ingest boundary
  // explodes each shard into per-member rows WITH the grouping: stem
  // and per-stem member count computed inside the batch worker (the
  // shard's members are co-located in one payload — counting there
  // is free and saves downstream a (shard, stem) shuffle). The tar
  // walk is real ustar: header CHECKSUM verified before any field is
  // trusted, octal sizes, 512-block padding, zero-block terminator;
  // truncated or checksum-corrupt shards drop whole. Planted shards
  // vary samples per shard (1 + id%2) and members per sample (2 or 3
  // — the .cls member appears when (id+j) is even), so incomplete-
  // sample detection has both counts on gate data. The oracle
  // rebuilds every member body closed-form with repeat(); planting
  // never reads `text`.
  //
  // 100 TB posture: the BatchedDecode seam, one member's bytes in
  // memory at a time; only the final oracle orderBy exchanges.
  def q137(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Archives
      .explodeTarSamples(
        graft.multimodal.Archives.tarMediaFromDocuments(
          tbl(spark, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"), col("entry"))

  val q137Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id, u.j
      |  FROM documents,
      |    unnest(range(0, CAST(1 + doc_id % 2 AS BIGINT))) AS u(j)
      |), m AS (
      |  SELECT media_id, j,
      |    's' || CAST(j AS VARCHAR) AS stem,
      |    's' || CAST(j AS VARCHAR) || '.txt' AS entry,
      |    repeat('doc ' || CAST(media_id AS VARCHAR) || ' entry ' ||
      |      CAST(j * 2 AS VARCHAR) || ' ',
      |      CAST(1 + (media_id + j * 2) % 5 AS BIGINT)) AS body
      |  FROM g
      |  UNION ALL
      |  SELECT media_id, j,
      |    's' || CAST(j AS VARCHAR),
      |    's' || CAST(j AS VARCHAR) || '.json',
      |    repeat('doc ' || CAST(media_id AS VARCHAR) || ' entry ' ||
      |      CAST(j * 2 + 1 AS VARCHAR) || ' ',
      |      CAST(1 + (media_id + j * 2 + 1) % 5 AS BIGINT))
      |  FROM g
      |  UNION ALL
      |  SELECT media_id, j,
      |    's' || CAST(j AS VARCHAR),
      |    's' || CAST(j AS VARCHAR) || '.cls',
      |    CAST(j AS VARCHAR)
      |  FROM g WHERE (media_id + j) % 2 = 0
      |)
      |SELECT media_id, stem, entry,
      |  CAST(octet_length(encode(body)) AS BIGINT) AS n_bytes,
      |  md5(body) AS body_md5,
      |  CAST(CASE WHEN (media_id + j) % 2 = 0 THEN 3 ELSE 2 END
      |    AS BIGINT) AS n_in_sample
      |FROM m ORDER BY media_id, entry""".stripMargin

  // ---- q144: REAL AIFF/AU audio decode (JDK javax.sound readers) ----
  // Audio's q138 move: the JDK also ships AIFF and AU file readers
  // (java.desktop's javax.sound.sampled), so both formats decode for
  // real — ServiceLoader provider scan amortized to one per batch via
  // Audio.Handle — shrinking the labeled fmt='gm' fallback to formats
  // with NO in-JDK codec at all (MP3, video). Encode and decode are
  // INDEPENDENT implementations: hand-written byte layout (including
  // AIFF's 80-bit extended sample rate) in, the JDK's codec out, and
  // the DuckDB oracle recomputes every statistic (abs-sum, raw
  // min/max, order-sensitive wsum) from doc_id alone — so a bug at
  // either end, or in the 80-bit rate encode, hash-fails the gate.
  //
  // 100 TB posture: identical to q129/q138 — narrow decode through
  // the one-handle-per-batch seam, payloads never shuffled, compact
  // typed rows out; only the final oracle orderBy exchanges.
  def q144(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BatchedDecode
      .decodeStats(audioMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's map stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))

  val q144Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'aif' ELSE 'au' END AS fmt,
      |    8000 + (doc_id % 8) * 1000 AS w,
      |    64 + doc_id % 128 AS n_units,
      |    list_transform(range(0, CAST(64 + doc_id % 128 AS BIGINT)),
      |      i -> ((doc_id * 173 + i * 19) % 4097) - 2048) AS smp
      |  FROM documents
      |)
      |SELECT media_id, fmt, CAST(w AS BIGINT) AS w, CAST(1 AS BIGINT) AS h,
      |  CAST(n_units AS BIGINT) AS n_units,
      |  CAST(list_sum(list_transform(smp, s -> abs(s))) AS BIGINT) AS sum_val,
      |  CAST(list_min(smp) AS BIGINT) AS min_val,
      |  CAST(list_max(smp) AS BIGINT) AS max_val,
      |  CAST(list_sum(list_transform(range(0, CAST(n_units AS BIGINT)),
      |    i -> i * abs(smp[i + 1]))) AS BIGINT) AS wsum_val
      |FROM g ORDER BY media_id""".stripMargin

  // ---- q140: perceptual image near-dup (dHash + banded Hamming) ----
  // The LAION-style image dedup step, closing text/image asymmetry
  // (text had six dedup modalities, images zero): REAL planted PGM
  // rasters (dhashMediaFromDocuments — scenes of brightness-shifted /
  // locally-edited / unrelated variants) decode through the
  // one-handle-per-batch seam straight to Phash's 64-bit dHash as
  // four 16-bit limbs, then a banded Hamming self-join: candidates
  // share at least one limb exactly (the q49 SimHash limb layout,
  // paired by Buckets.cappedSelfJoinPairs with the hot-bucket cap —
  // default never binds on gate data, so the capless oracle matches
  // bit-for-bit), confirmed at hamming <= MaxHam. By pigeonhole the
  // band is EXHAUSTIVE for hamming <= 3 (4 limbs, 3 flipped bits
  // leave one limb untouched); above that recall is what q141
  // measures. Uniform brightness pairs land at hamming 0, the local
  // edits at <= 5 — both inside the threshold; unrelated rasters sit
  // near 32 and never pass.
  //
  // 100 TB posture: map-only decode+hash (payloads never shuffled),
  // then the banded self-join moves only (id, 4 limbs, bucket) rows —
  // never rasters; candidate volume is bounded by the bucket cap, and
  // the planted scene mix keeps true-pair volume LINEAR in corpus
  // size (the big-modulus scene mix — see dhashMediaFromDocuments —
  // so replica gates measure the production law, not a fixture
  // artifact).
  private val MaxHam = 8

  /** dHash limb bucket keys: limb index tagged into the value so the
    * four band tables share one join column. `limbKeysOf` is THE
    * bucket-key encoding — probe side (`l0..l3`) and anchor side
    * (`al0..al3`, q141/q156) must share it verbatim or a key-format
    * drift on one side silently zeroes recall.
    */
  private[graft] def limbKeysOf(prefix: String) = array((0 until 4).map(l =>
    lit(l) * 65536 + col(s"$prefix$l")): _*)

  private def limbKeys = limbKeysOf("l")

  private def hamming(a: String, b: String) =
    (0 until 4).map(l =>
      bit_count(col(s"$a.l$l").bitwiseXOR(col(s"$b.l$l")))).reduce(_ + _)

  def q140(spark: SparkSession, dir: String): DataFrame = {
    val hashes = graft.multimodal.BatchedDecode
      .decodeDHash(dhashMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      // shuffle barrier: the self-join's sides are sibling stages of
      // one job and would race to re-run the decode+hash pass (the
      // q31 treatment)
      .repartition(col("media_id"))
    val banded = hashes.select(col("media_id"),
      col("l0"), col("l1"), col("l2"), col("l3"),
      explode(limbKeys).as("bk"))
    graft.operators.Buckets
      .cappedSelfJoinPairs(banded, "media_id", "bk", 100000L)
      .select(
        col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        hamming("a", "b").cast("long").as("hamming"))
      .filter(col("hamming") <= MaxHam)
      .distinct() // one row per pair, however many limbs collided
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shared oracle CTE chain for the dHash pipeline: planted cell
    * values (`cells`, 72 per doc — the raster's box averages by
    * construction) and the four 16-bit limbs (`h`). One definition
    * for q140 and the q141 audit, the minhashSigCte pattern.
    */
  private val dhashCte: String = {
    // dHash bit b (= l*16 + j for limb l) compares grid cell
    // (cy = b/8, cx = b%8) against its right neighbor; with
    // b = 16l + j that is cell ((j/8 + 2l)*9 + j%8), 1-indexed +1.
    def limb(l: Int) =
      s"""CAST(list_sum(list_transform(range(0, 16), j ->
         |      CASE WHEN cv[(j // 8 + ${2 * l}) * 9 + (j % 8) + 1] >
         |                cv[(j // 8 + ${2 * l}) * 9 + (j % 8) + 2]
         |           THEN 1 << j ELSE 0 END)) AS BIGINT) AS l$l""".stripMargin
    // the square mix (v -> v^2 % 1000003 % 190) mirrored from
    // dhashMediaFromDocuments — scatter, see its scaladoc
    val v0 = "((doc_id // 4 * 2654435761 + c * 40503) % 1000003)"
    val v3 = "((doc_id // 4 * 1579032867 + c * 97003 + 7) % 1000003)"
    s"""cells AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(range(0, 72), c ->
       |      CASE doc_id % 4
       |        WHEN 3 THEN ($v3 * $v3 % 1000003) % 190
       |        ELSE ($v0 * $v0 % 1000003) % 190
       |          + CASE WHEN doc_id % 4 = 1 THEN 40
       |                 WHEN doc_id % 4 = 2 AND c % 24 = 0 THEN 60
       |                 ELSE 0 END
       |      END) AS cv
       |  FROM documents
       |), h AS (
       |  SELECT media_id,
       |    ${(0 until 4).map(limb).mkString(",\n    ")}
       |  FROM cells
       |)""".stripMargin
  }

  val q140Sql: String = {
    val ham = (0 until 4)
      .map(l => s"bit_count(xor(a.l$l, b.l$l))").mkString(" + ")
    // four limb-equality equi joins UNIONed (set semantics dedup)
    // rather than one OR-join: each branch hash-joins, so the oracle
    // stays tractable at replica scale
    val branch = (l: Int) =>
      s"""SELECT a.media_id AS id_a, b.media_id AS id_b,
         |    CAST($ham AS BIGINT) AS hamming
         |  FROM h a JOIN h b
         |    ON a.l$l = b.l$l AND a.media_id < b.media_id""".stripMargin
    s"""WITH $dhashCte, cand AS (
       |  ${(0 until 4).map(branch).mkString("\n  UNION\n  ")}
       |)
       |SELECT id_a, id_b, hamming FROM cand
       |WHERE hamming <= $MaxHam
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- q141: perceptual near-dup recall audit (anchored) ----
  // The q105 posture for the image family: BEFORE trusting q140's
  // banded candidate generation, measure — per anchor — what fraction
  // of the EXACT hamming<=MaxHam neighbor set the limb-collision band
  // surfaces. Banding is provably exhaustive at hamming <= 3
  // (pigeonhole over 4 limbs); 4..8 is the regime this audit prices.
  //
  // The anchor panel is FIXED-SIZE (media_id % 25 = 0 AND media_id <
  // 25000, i.e. at most 1000 probes regardless of corpus size) — a
  // production audit samples a constant probe panel, so the exact
  // side costs |panel| x n, LINEAR in the corpus, and the replica
  // oracle gate can run this audit at every factor (the r13 verdict's
  // item 7 posture, designed in rather than retrofitted).
  def q141(spark: SparkSession, dir: String): DataFrame = {
    val hashes = graft.multimodal.BatchedDecode
      .decodeDHash(dhashMediaFromDocuments(tbl(spark, dir, "documents")))
      .toDF()
      .persist() // anchors + exact + banded sides are sibling readers
    hashes.count()
    val anchors = hashes
      .filter(col("media_id") % 25 === 0 && col("media_id") < 25000)
      .select(col("media_id").as("aid"), col("l0").as("al0"),
        col("l1").as("al1"), col("l2").as("al2"), col("l3").as("al3"))
    val hamA = (0 until 4).map(l =>
      bit_count(col(s"al$l").bitwiseXOR(col(s"l$l")))).reduce(_ + _)
    // exact side: broadcast the bounded panel against the full table —
    // map-only per-row hamming, no shuffle of the big side
    val ex = hashes.join(broadcast(anchors),
        col("aid") =!= col("media_id"))
      .filter(hamA <= MaxHam)
      .groupBy(col("aid").as("anchor_id"))
      .agg(count(lit(1)).as("n_exact"))
    // banded side: the q140 candidate rule restricted to the panel —
    // anchor limb keys broadcast-joined to the full table's keys
    val aKeys = anchors.select(col("aid"), col("al0"), col("al1"),
      col("al2"), col("al3"),
      explode(limbKeysOf("al")).as("bk"))
    val dKeys = hashes.select(col("media_id"),
      col("l0"), col("l1"), col("l2"), col("l3"),
      explode(limbKeys).as("bk"))
    val hits = dKeys.join(broadcast(aKeys), Seq("bk"))
      .filter(col("aid") =!= col("media_id"))
      .filter(hamA <= MaxHam)
      .select(col("aid"), col("media_id")).distinct()
      .groupBy(col("aid")).agg(count(lit(1)).as("n_hit"))
    ex.join(hits, col("anchor_id") === col("aid"), "left")
      .select(col("anchor_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_e6", expr("n_hit * 1000000 div n_exact"))
      .orderBy(col("anchor_id"))
  }

  val q141Sql: String = {
    val hamAd = (0 until 4)
      .map(l => s"bit_count(xor(a.l$l, d.l$l))").mkString(" + ")
    s"""WITH $dhashCte, anch AS (
       |  SELECT * FROM h WHERE media_id % 25 = 0 AND media_id < 25000
       |), ex AS (
       |  SELECT a.media_id AS anchor_id, count(*) AS n_exact
       |  FROM anch a JOIN h d ON d.media_id != a.media_id
       |  WHERE $hamAd <= $MaxHam
       |  GROUP BY 1
       |), hit AS (
       |  SELECT DISTINCT a.media_id AS anchor_id, d.media_id AS did
       |  FROM anch a JOIN h d ON d.media_id != a.media_id
       |   AND (a.l0 = d.l0 OR a.l1 = d.l1 OR a.l2 = d.l2 OR a.l3 = d.l3)
       |  WHERE $hamAd <= $MaxHam
       |), hc AS (
       |  SELECT anchor_id, count(*) AS n_hit FROM hit GROUP BY 1
       |)
       |SELECT e.anchor_id, e.n_exact,
       |  coalesce(hc.n_hit, 0) AS n_hit,
       |  coalesce(hc.n_hit, 0) * 1000000 // e.n_exact AS recall_e6
       |FROM ex e LEFT JOIN hc ON hc.anchor_id = e.anchor_id
       |ORDER BY e.anchor_id""".stripMargin
  }

  // ---- q146: autocorrelation pitch detection over decoded PCM ----
  // The first DSP feature past raw decode statistics: each doc plants
  // a REAL PCM16 mono WAV whose waveform is periodic with period
  // P = 12 + id % 40 (integer LCG samples over one period, tiled),
  // the engine decodes the BYTES back (Codecs.decodeWavSamples — the
  // same RIFF walk as q129's stats path) and runs time-domain
  // autocorrelation R(L) = Σ s(i)·s(i+L) over lags 2..64. Everything
  // is integer arithmetic over int16 samples, so the DuckDB oracle
  // recomputes the ENTIRE feature — every lag's correlation, the
  // argmax with its smallest-lag tie rule, and the normalized peak —
  // from doc_id alone with zero FP divergence. A bug anywhere in the
  // encoder, the RIFF walk, the sample reconstruction, or the ACF
  // loop hash-fails the gate.
  //
  // 100 TB posture: identical to q129/q144 — map-side decode+DSP
  // (O(n·maxLag) per payload), payloads never shuffled, 6 compact
  // columns out; only the final oracle orderBy exchanges.
  def q146(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{Acf, Codecs}
    tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val p = (12 + id % 40).toInt
        val n = (200 + id % 100).toInt
        val wav = Codecs.encodeWav(8000, n,
          i => (((id * 37 + (i % p) * 101) % 4001) - 2000).toInt)
        // a decode failure DROPS the row -> row-count mismatch reds
        // the gate loudly instead of fabricating stats
        Codecs.decodeWavSamples(wav).map { case (_, smp) =>
          val (energy, lag, r) = Acf.pitch(smp, 2, 64)
          Acf.PitchRow(id, smp.length.toLong, energy, lag, r)
        }
      }
      .toDF()
      .withColumn("nacf_e4",
        round(lit(10000.0) * col("r_best") / col("energy")).cast("long"))
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's whole decode stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))
  }

  val q146Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id, 12 + doc_id % 40 AS p,
      |    200 + doc_id % 100 AS n
      |  FROM documents
      |), s AS (
      |  SELECT media_id, n, list_transform(range(0, CAST(n AS BIGINT)),
      |    j -> ((media_id * 37 + (j % p) * 101) % 4001) - 2000) AS smp
      |  FROM g
      |), acf AS (
      |  SELECT media_id, n, CAST(u.l AS BIGINT) AS l,
      |    CAST(coalesce(list_sum(list_transform(
      |      range(0, CAST(n - u.l AS BIGINT)),
      |      i -> smp[i + 1] * smp[i + u.l + 1])), 0) AS BIGINT) AS r
      |  FROM s, unnest(range(0, 65)) AS u(l)
      |), e AS (
      |  SELECT media_id, r AS energy FROM acf WHERE l = 0
      |), best AS (
      |  SELECT media_id, n, l AS best_lag, r AS r_best,
      |    row_number() OVER (PARTITION BY media_id
      |                       ORDER BY r DESC, l) AS rk
      |  FROM acf WHERE l >= 2
      |)
      |SELECT b.media_id, CAST(b.n AS BIGINT) AS n_samples, e.energy,
      |  b.best_lag, b.r_best,
      |  CAST(round(10000.0 * b.r_best / e.energy, 0) AS BIGINT) AS nacf_e4
      |FROM best b JOIN e USING (media_id)
      |WHERE b.rk = 1 ORDER BY b.media_id""".stripMargin

  // ---- q148: REAL GIF decode (hand-written LZW encode, JDK decode) ----
  // The palette/LZW member of the real-decoder family, closing the
  // indexed-color gap beside PNG (zlib), BMP (raw), JPEG (DCT):
  // payloads are built by Gif.encodeGray — a hand-written GIF89a
  // layout with its own uncompressed-LZW bitstream — and decoded by
  // the JDK's REAL ImageIO LZW codec through the one-handle-per-batch
  // seam, with palette-aware luma reduction. GIF is lossless, so the
  // DuckDB oracle recomputes every statistic (including the order-
  // sensitive wsum, which catches sub-block or bit-packing bugs that
  // recover the right multiset in the wrong order) closed-form from
  // doc_id alone; the two LZW implementations must agree byte-for-bit
  // for the gate to pass.
  //
  // 100 TB posture: identical to q129/q138/q144 — narrow decode,
  // payloads never shuffled, compact typed rows out; only the final
  // oracle orderBy exchanges.
  def q148(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (10 + id % 20).toInt
        val h = (6 + id % 10).toInt
        (id, graft.multimodal.Gif.encodeGray(w, h,
          i => ((id * 53 + i * 11) % 256).toInt))
      }
      .toDF("media_id", "payload")
    graft.multimodal.BatchedDecode.decodeStats(media)
      .toDF()
      // r18: cache the small pre-sort result — the orderBy's range
      // partitioner samples its child with one extra execution, which
      // re-ran this query's map stage (measured; see OPTIMIZATION_r18.md)
      .persist()
      .orderBy(col("media_id"))
  }

  val q148Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id, 10 + doc_id % 20 AS w,
      |    6 + doc_id % 10 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h,
      |    list_transform(range(0, CAST(w * h AS BIGINT)),
      |      i -> (media_id * 53 + i * 11) % 256) AS px
      |  FROM g
      |)
      |SELECT media_id, 'gif' AS fmt, CAST(w AS BIGINT) AS w,
      |  CAST(h AS BIGINT) AS h, CAST(w * h AS BIGINT) AS n_units,
      |  CAST(list_sum(px) AS BIGINT) AS sum_val,
      |  CAST(list_min(px) AS BIGINT) AS min_val,
      |  CAST(list_max(px) AS BIGINT) AS max_val,
      |  CAST(list_sum(list_transform(range(0, CAST(w * h AS BIGINT)),
      |    i -> i * px[i + 1])) AS BIGINT) AS wsum_val
      |FROM px ORDER BY media_id""".stripMargin

  // ---- q151: MP4/ISO-BMFF container probe (video metadata, real) ----
  // The video half of multimodal curation that runs WITHOUT a codec:
  // duration/timescale/track-count/resolution come from a real
  // pre-order box walk over hand-written BMFF payloads (ftyp + moov
  // (mvhd + n trak(tkhd)) + mdat), so length/resolution filters and
  // sampling plans are metadata passes — pixel decode stays the
  // labeled fmt='gm' fallback, now shrunk to exactly that. The
  // order-sensitive wsum over walk-order box sizes catches a
  // traversal that visits the right boxes in the wrong order or
  // mis-sizes one; the DuckDB oracle recomputes every field AND the
  // full size list closed-form from doc_id (all integer arithmetic,
  // duration_ms = dur·1000 div timescale).
  //
  // 100 TB posture: map-only probe, payloads never shuffled, 10
  // compact columns out; only the final oracle orderBy exchanges.
  def q151(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Mp4
    tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val n = (1 + id % 3).toInt
        val dims = (0 until n).map(k =>
          ((320 + 16 * k + (id % 8) * 4).toInt,
            (240 + 8 * k + (id % 6) * 4).toInt))
        val payload = Mp4.encode(
          if (id % 2 == 0) "isom" else "mp42",
          1000 + (id % 10) * 100, 3000 + id % 50000, dims,
          (100 + id % 900).toInt)
        // a probe failure DROPS the row -> row-count mismatch reds
        // the gate loudly instead of fabricating metadata
        Mp4.probe(id, payload)
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  val q151Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
      |    1000 + (doc_id % 10) * 100 AS ts,
      |    3000 + doc_id % 50000 AS dur,
      |    1 + doc_id % 3 AS n,
      |    100 + doc_id % 900 AS mlen
      |  FROM documents
      |), s AS (
      |  SELECT *, list_concat(list_concat(
      |    [CAST(24 AS BIGINT), CAST(116 + 100 * n AS BIGINT),
      |     CAST(108 AS BIGINT)],
      |    flatten(list_transform(range(0, CAST(n AS BIGINT)),
      |      k -> [CAST(100 AS BIGINT), CAST(92 AS BIGINT)]))),
      |    [CAST(8 + mlen AS BIGINT)]) AS sizes
      |  FROM g
      |)
      |SELECT media_id, brand, CAST(ts AS BIGINT) AS timescale,
      |  CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
      |  CAST(n AS BIGINT) AS n_tracks,
      |  CAST(320 + (media_id % 8) * 4 AS BIGINT) AS w0,
      |  CAST(240 + (media_id % 6) * 4 AS BIGINT) AS h0,
      |  CAST(mlen AS BIGINT) AS mdat_bytes,
      |  CAST(len(sizes) AS BIGINT) AS n_boxes,
      |  CAST(list_sum(list_transform(
      |    range(0, CAST(len(sizes) AS BIGINT)),
      |    i -> i * sizes[i + 1])) AS BIGINT) AS wsum_boxes
      |FROM s ORDER BY media_id""".stripMargin

  // ---- q152: TIFF/EXIF IFD metadata probe (both byte orders) ----
  // The image twin of q151's container walk: width/height/
  // orientation/make out of the IFD without decoding pixels. The
  // planted corpus ALTERNATES "II" and "MM" byte orders, so an
  // engine that hard-codes one endianness hash-fails half the gate;
  // ASCII tags dereference their value offset like real writers
  // emit them, and the probe enforces the spec's ascending-tag-order
  // rule. Every field plus the order-sensitive tag wsum is
  // recomputed closed-form by the DuckDB oracle.
  //
  // 100 TB posture: map-only probe, payloads never shuffled, compact
  // typed rows out; only the final oracle orderBy exchanges.
  def q152(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Tiff
    tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val payload = Tiff.encode(
          littleEndian = id % 2 == 0,
          width = (100 + id % 500).toInt,
          height = (80 + id % 400).toInt,
          bps = (8 + (id % 2) * 8).toInt,
          orientation = (1 + id % 8).toInt,
          make = s"CAM${id % 10}")
        Tiff.probe(id, payload) // a failure drops the row -> red gate
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  val q152Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
      |  CAST(100 + doc_id % 500 AS BIGINT) AS width,
      |  CAST(80 + doc_id % 400 AS BIGINT) AS height,
      |  CAST(8 + (doc_id % 2) * 8 AS BIGINT) AS bps,
      |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
      |  'CAM' || CAST(doc_id % 10 AS VARCHAR) AS make,
      |  CAST(5 AS BIGINT) AS n_entries,
      |  CAST(0 * 256 + 1 * 257 + 2 * 258 + 3 * 271 + 4 * 274 AS BIGINT)
      |    AS wsum_tags
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q153: WARC-style multi-member gzip explode ----
  // The Common-Crawl ingest boundary: crawl archives are CONCATENATED
  // gzip members (one record per member, seekable by design), and
  // GZIPInputStream hides the boundaries — so the walk is manual:
  // per-member header parse (FNAME handled; FEXTRA/FCOMMENT/FHCRC
  // skipped by spec), raw Inflater per member, CRC32 + ISIZE trailer
  // verification, exact compressed-length advance. Encoder writes
  // headers by hand; bodies are lossless through gzip, so the DuckDB
  // oracle recomputes every member's name/size/md5 closed-form from
  // doc_id — boundary drift, trailer bugs, or a swallowed member
  // hash-fail. A shard failing any checksum quarantines WHOLE.
  //
  // 100 TB posture: identical to q136/q137 — narrow member walk,
  // payloads never shuffled, compact typed rows out; only the final
  // oracle orderBy exchanges.
  def q153(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.GzipMembers
    graft.operators.ScanFanOut(tbl(spark, dir, "documents"))
      .select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val members = (0 until (1 + id % 4).toInt).map { j =>
          val name = if (j % 2 == 0) s"rec$j.warc" else null
          val body = ("doc " + id + " record " + j + " ") *
            (1 + (id + j) % 6).toInt
          (name, body.getBytes("UTF-8"))
        }
        GzipMembers.walk(id, GzipMembers.encodeMembers(members))
          .getOrElse(Vector.empty) // drop-on-failure -> red gate
      }
      .toDF()
      .orderBy(col("media_id"), col("member"))
  }

  val q153Sql: String =
    """WITH g AS (
      |  SELECT doc_id AS media_id, u.j
      |  FROM documents,
      |    unnest(range(0, CAST(1 + doc_id % 4 AS BIGINT))) AS u(j)
      |), m AS (
      |  SELECT media_id, j,
      |    CASE WHEN j % 2 = 0 THEN 'rec' || CAST(j AS VARCHAR) || '.warc'
      |         ELSE '' END AS name,
      |    repeat('doc ' || CAST(media_id AS VARCHAR) || ' record ' ||
      |      CAST(j AS VARCHAR) || ' ',
      |      CAST(1 + (media_id + j) % 6 AS BIGINT)) AS body
      |  FROM g
      |)
      |SELECT media_id, CAST(j AS BIGINT) AS member, name,
      |  CAST(octet_length(encode(body)) AS BIGINT) AS n_bytes,
      |  md5(body) AS body_md5,
      |  CAST(1 + media_id % 4 AS BIGINT) AS n_members
      |FROM m ORDER BY media_id, member""".stripMargin

  // ---- q154: TFRecord framing + protobuf wire-format walk ----
  // The TensorFlow data boundary: training shards are TFRecord files
  // (u64le length + masked-CRC32C of the length + payload +
  // masked-CRC32C of the payload; mask = rot15 + 0xa282ead8, CRC32C
  // from the JDK) whose payloads are protobuf messages. Both layers
  // walk for real: framing verifies BOTH checksums per record and
  // quarantines the shard whole on any failure (the q153 rule);
  // the payload walk is a generic protobuf field scan (varint
  // decode, unknown fields skipped by wire type) extracting field 1
  // (varint) and field 2 (length-delimited -> md5). The DuckDB
  // oracle recomputes field values, payload lengths INCLUDING the
  // varint-width arithmetic, and digests closed-form from doc_id —
  // so a varint encoder/decoder disagreement surfaces as a length
  // mismatch, not silence.
  //
  // 100 TB posture: identical to q136/q137/q153 — narrow record
  // walk, payloads never shuffled, compact typed rows out; only the
  // final oracle orderBy exchanges.
  def q154(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Tfrecord
    tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val payloads = (0 until (1 + id % 5).toInt).map { j =>
          val body = ("doc " + id + " example " + j + " ") *
            (1 + (id + j) % 6).toInt
          Tfrecord.encodeExample(id * 3 + j, body.getBytes("UTF-8"))
        }
        Tfrecord.walk(id, Tfrecord.encodeShard(payloads))
          .getOrElse(Vector.empty) // drop-on-failure -> red gate
      }
      .toDF()
      .orderBy(col("media_id"), col("rec"))
  }

  val q154Sql: String = {
    val vlen = (e: String) =>
      s"""(CASE WHEN $e < 128 THEN 1 WHEN $e < 16384 THEN 2
         |      WHEN $e < 2097152 THEN 3 WHEN $e < 268435456 THEN 4
         |      ELSE 5 END)""".stripMargin
    s"""WITH g AS (
       |  SELECT doc_id AS media_id, u.j
       |  FROM documents,
       |    unnest(range(0, CAST(1 + doc_id % 5 AS BIGINT))) AS u(j)
       |), m AS (
       |  SELECT media_id, j, media_id * 3 + j AS f1,
       |    repeat('doc ' || CAST(media_id AS VARCHAR) || ' example ' ||
       |      CAST(j AS VARCHAR) || ' ',
       |      CAST(1 + (media_id + j) % 6 AS BIGINT)) AS body
       |  FROM g
       |), s AS (
       |  SELECT media_id, j, f1,
       |    CAST(octet_length(encode(body)) AS BIGINT) AS blen,
       |    md5(body) AS f2_md5
       |  FROM m
       |)
       |SELECT media_id, CAST(j AS BIGINT) AS rec,
       |  CAST(2 + ${vlen("f1")} + ${vlen("blen")} + blen AS BIGINT)
       |    AS n_bytes,
       |  CAST(f1 AS BIGINT) AS f1, f2_md5,
       |  CAST(1 + media_id % 5 AS BIGINT) AS n_records
       |FROM s ORDER BY media_id, rec""".stripMargin
  }

  // ---- q155: perceptual AUDIO near-dup (energy-delta hash) ----
  // Completes the near-dup triad across modalities (text q31/q49,
  // image q140, audio THIS): planted WAVs decode for REAL
  // (Codecs.decodeWavSamples — the q146 seam) to AudioHash's 64-bit
  // sign-of-energy-delta fingerprint as four 16-bit limbs, then the
  // SAME banded Hamming machinery as q140 (limb keys,
  // cappedSelfJoinPairs, pigeonhole-exhaustive at hamming <= 3).
  // Scene mix mirrors q140's: families of 4 (doc_id // 4) plant a
  // base signal, a gain-doubled copy (hamming 0 — energy scaling
  // preserves every comparison INCLUDING ties, the brightness-
  // invariance analogue), a 2-frame splice (<= 3 bits), and an
  // unrelated signal (~32 bits, never passes). All integer
  // arithmetic, so the DuckDB oracle recomputes energies -> bits ->
  // limbs -> banded pairs bit-exactly from doc_id.
  //
  // 100 TB posture: map-only decode+hash (payloads never shuffled);
  // the banded self-join moves (id, 4 limbs, bucket) rows only;
  // family mix keeps true-pair volume LINEAR in corpus size.
  /** The audio fingerprint table (media_id, l0-l3): planted scene
    * WAVs decoded for REAL and hashed — shared by q155 (pairs) and
    * q156 (audit), the dhashMediaFromDocuments pattern.
    */
  private def audioHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{AudioHash, Codecs}
    tbl(spark, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val f = id / 4
        val m = id % 4
        // square mix (v -> v^2 % 1000003 % 4001) — the q140 scatter:
        // a raw LCG leaves families phase-correlated (measured 2,468
        // pairs at sf0.01 vs ~375 planted; cross-family fingerprints
        // collide through the shared arithmetic-progression shape),
        // squaring decorrelates frames and families
        val sample: Int => Int = { i =>
          val v =
            if (m == 3) (f * 1579032867L + i * 97003L + 7) % 1000003L
            else if (m == 2 && i >= 480 && i < 512)
              (f * 2654435761L + i * 40503L + 911) % 1000003L
            else (f * 2654435761L + i * 40503L) % 1000003L
          val base = (v * v % 1000003L % 4001L - 2000L).toInt
          if (m == 1) 2 * base else base
        }
        val wav = Codecs.encodeWav(8000, AudioHash.MinSamples, sample)
        for {
          (_, smp) <- Codecs.decodeWavSamples(wav)
          l <- AudioHash.limbs(smp)
        } yield (id, l(0), l(1), l(2), l(3))
      }
      .toDF("media_id", "l0", "l1", "l2", "l3")
  }

  def q155(spark: SparkSession, dir: String): DataFrame = {
    val hashes = audioHashes(spark, dir)
      .repartition(col("media_id")) // barrier: self-join sides share it
    val banded = hashes.select(col("media_id"),
      col("l0"), col("l1"), col("l2"), col("l3"),
      explode(limbKeys).as("bk"))
    graft.operators.Buckets
      .cappedSelfJoinPairs(banded, "media_id", "bk", 100000L)
      .select(
        col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        hamming("a", "b").cast("long").as("hamming"))
      .filter(col("hamming") <= MaxHam)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shared oracle CTE chain for the audio fingerprint (planted
    * sample abs -> 65 frame energies -> limbs), the dhashCte pattern:
    * one definition for q155 and the q156 audit.
    */
  private val audioHashCte: String = {
    // planted sample value at index i (scale applied), abs folded in
    // the energy sum; ev = 65 frame energies; bit b = ev[b+2]>ev[b+1]
    val v =
      """(CASE WHEN media_id % 4 = 3
        |     THEN ((media_id // 4) * 1579032867 + i * 97003 + 7) % 1000003
        |     WHEN media_id % 4 = 2 AND i >= 480 AND i < 512
        |     THEN ((media_id // 4) * 2654435761 + i * 40503 + 911) % 1000003
        |     ELSE ((media_id // 4) * 2654435761 + i * 40503) % 1000003
        |   END)""".stripMargin
    val sampleAbs =
      s"""abs((CASE WHEN media_id % 4 = 1 THEN 2 ELSE 1 END) *
         |  ($v * $v % 1000003 % 4001 - 2000))""".stripMargin
    def limb(l: Int) =
      s"""CAST(list_sum(list_transform(range(0, 16), j ->
         |      CASE WHEN ev[${16 * l} + j + 2] > ev[${16 * l} + j + 1]
         |           THEN 1 << j ELSE 0 END)) AS BIGINT) AS l$l""".stripMargin
    s"""ecte AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(range(0, 65), k ->
       |      CAST(list_sum(list_transform(range(k * 16, k * 16 + 16),
       |        i -> $sampleAbs)) AS BIGINT)) AS ev
       |  FROM documents
       |), h AS (
       |  SELECT media_id,
       |    ${(0 until 4).map(limb).mkString(",\n    ")}
       |  FROM ecte
       |)""".stripMargin
  }

  val q155Sql: String = {
    val ham = (0 until 4)
      .map(l => s"bit_count(xor(a.l$l, b.l$l))").mkString(" + ")
    val branch = (l: Int) =>
      s"""SELECT a.media_id AS id_a, b.media_id AS id_b,
         |    CAST($ham AS BIGINT) AS hamming
         |  FROM h a JOIN h b
         |    ON a.l$l = b.l$l AND a.media_id < b.media_id""".stripMargin
    s"""WITH $audioHashCte, cand AS (
       |  ${(0 until 4).map(branch).mkString("\n  UNION\n  ")}
       |)
       |SELECT id_a, id_b, hamming FROM cand
       |WHERE hamming <= $MaxHam
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- q156: audio near-dup recall audit (anchored) ----
  // The q141 posture for the audio family: BEFORE trusting q155's
  // limb-collision band above its pigeonhole-exhaustive range
  // (hamming <= 3), measure — per fixed-size anchor — what fraction
  // of the EXACT hamming<=MaxHam neighbor set the band surfaces.
  // Every approximate path in this engine ships its own measurement
  // (q105/q123/q126/q127/q128/q135/q141, and now this); the anchor
  // panel is bounded (media_id % 25 = 0 AND < 25000), so the exact
  // side is LINEAR in the corpus and replica-gateable.
  def q156(spark: SparkSession, dir: String): DataFrame = {
    val hashes = audioHashes(spark, dir)
      .persist() // anchors + exact + banded sides are sibling readers
    hashes.count()
    val anchors = hashes
      .filter(col("media_id") % 25 === 0 && col("media_id") < 25000)
      .select(col("media_id").as("aid"), col("l0").as("al0"),
        col("l1").as("al1"), col("l2").as("al2"), col("l3").as("al3"))
    val hamA = (0 until 4).map(l =>
      bit_count(col(s"al$l").bitwiseXOR(col(s"l$l")))).reduce(_ + _)
    val ex = hashes.join(broadcast(anchors),
        col("aid") =!= col("media_id"))
      .filter(hamA <= MaxHam)
      .groupBy(col("aid").as("anchor_id"))
      .agg(count(lit(1)).as("n_exact"))
    val aKeys = anchors.select(col("aid"), col("al0"), col("al1"),
      col("al2"), col("al3"),
      explode(limbKeysOf("al")).as("bk"))
    val dKeys = hashes.select(col("media_id"),
      col("l0"), col("l1"), col("l2"), col("l3"),
      explode(limbKeys).as("bk"))
    val hits = dKeys.join(broadcast(aKeys), Seq("bk"))
      .filter(col("aid") =!= col("media_id"))
      .filter(hamA <= MaxHam)
      .select(col("aid"), col("media_id")).distinct()
      .groupBy(col("aid")).agg(count(lit(1)).as("n_hit"))
    ex.join(hits, col("anchor_id") === col("aid"), "left")
      .select(col("anchor_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_e6", expr("n_hit * 1000000 div n_exact"))
      .orderBy(col("anchor_id"))
  }

  val q156Sql: String = {
    val hamAd = (0 until 4)
      .map(l => s"bit_count(xor(a.l$l, d.l$l))").mkString(" + ")
    s"""WITH $audioHashCte, anch AS (
       |  SELECT * FROM h WHERE media_id % 25 = 0 AND media_id < 25000
       |), ex AS (
       |  SELECT a.media_id AS anchor_id, count(*) AS n_exact
       |  FROM anch a JOIN h d ON d.media_id != a.media_id
       |  WHERE $hamAd <= $MaxHam
       |  GROUP BY 1
       |), hit AS (
       |  SELECT DISTINCT a.media_id AS anchor_id, d.media_id AS did
       |  FROM anch a JOIN h d ON d.media_id != a.media_id
       |   AND (a.l0 = d.l0 OR a.l1 = d.l1 OR a.l2 = d.l2 OR a.l3 = d.l3)
       |  WHERE $hamAd <= $MaxHam
       |), hc AS (
       |  SELECT anchor_id, count(*) AS n_hit FROM hit GROUP BY 1
       |)
       |SELECT e.anchor_id, e.n_exact,
       |  coalesce(hc.n_hit, 0) AS n_hit,
       |  coalesce(hc.n_hit, 0) * 1000000 // e.n_exact AS recall_e6
       |FROM ex e LEFT JOIN hc ON hc.anchor_id = e.anchor_id
       |ORDER BY e.anchor_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q156_audio_neardup_audit" -> (q156 _),
    "q155_audio_neardup" -> (q155 _),
    "q154_tfrecord" -> (q154 _),
    "q153_warc_members" -> (q153 _),
    "q152_tiff_probe" -> (q152 _),
    "q151_mp4_probe" -> (q151 _),
    "q148_gif_decode" -> (q148 _),
    "q146_audio_pitch" -> (q146 _),
    "q137_tar_samples" -> (q137 _),
    "q136_archive_explode" -> (q136 _),
    "q50_media_roundtrip" -> (q50 _),
    "q51_frame_features" -> (q51 _),
    "q59_batched_decode" -> (q59 _),
    "q129_codec_decode" -> (q129 _),
    "q130_png_decode" -> (q130 _),
    "q133_bmp_decode" -> (q133 _),
    "q138_jpeg_decode" -> (q138 _),
    "q140_image_neardup" -> (q140 _),
    "q141_image_neardup_audit" -> (q141 _),
    "q144_audio_decode" -> (q144 _)
  )

  val oracles: Map[String, String] = Map(
    "q156_audio_neardup_audit" -> q156Sql,
    "q155_audio_neardup" -> q155Sql,
    "q154_tfrecord" -> q154Sql,
    "q153_warc_members" -> q153Sql,
    "q152_tiff_probe" -> q152Sql,
    "q151_mp4_probe" -> q151Sql,
    "q148_gif_decode" -> q148Sql,
    "q146_audio_pitch" -> q146Sql,
    "q137_tar_samples" -> q137Sql,
    "q136_archive_explode" -> q136Sql,
    "q50_media_roundtrip" -> q50Sql,
    "q51_frame_features" -> q51Sql,
    "q59_batched_decode" -> q59Sql,
    "q129_codec_decode" -> q129Sql,
    "q130_png_decode" -> q130Sql,
    "q133_bmp_decode" -> q133Sql,
    "q138_jpeg_decode" -> q138Sql,
    "q140_image_neardup" -> q140Sql,
    "q141_image_neardup_audit" -> q141Sql,
    "q144_audio_decode" -> q144Sql
  )
}
