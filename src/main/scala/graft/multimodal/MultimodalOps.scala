package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus the Spark-side plumbing a real
  * decode/feature pipeline needs (schema, partitioning, batch shape).
  *
  * Decode status: PGM, WAV/PCM16, PNG, BMP (pure JVM raster/sample
  * math in [[Codecs]]) and JPEG (the JDK's bundled ImageIO reader,
  * [[Jpeg]]) all decode FOR REAL, exercised through the batched seam
  * by [[BatchedDecode.decodeStats]] (q129/q130/q133/q138). Only
  * formats with NO in-JDK codec (video containers, MP3) remain a
  * deterministic fake — `===STUB===` markers below show exactly
  * where a real decoder (ffmpeg via mapPartitions, or a Python
  * `mapInPandas` worker) plugs in, the same way the JPEG and PGM/WAV
  * decoders did. Everything around the stub
  * is real: a self-describing header in the binary payload, header
  * parsing with codegen'd binary Column functions (substring / hex /
  * conv — no UDFs), frame sampling by byte-range slicing, and
  * md5-derived feature vectors. At 100 TB the payload column stays
  * opaque (never shuffled whole unless the operator needs it;
  * metadata-only queries prune it away at the parquet scan).
  */
object MultimodalOps {

  /** Header layout: 'GM' magic (2) + kind/width/height/n_frames u16s
    * (8). Every byte-offset below derives from this.
    */
  val HeaderBytes = 10

  /** Big-endian uint16 -> 2-byte binary. */
  private def u16(v: Column): Column = unhex(lpad(hex(v.cast("int")), 4, "0"))

  /** Parse a big-endian uint16 at byte offset `off` (1-based). */
  def readU16(bytes: Column, off: Int): Column =
    conv(hex(substring(bytes, off, 2)), 16, 10).cast("long")

  /** Synthesize a media payload: magic 'GM' + kind + width + height +
    * n_frames header, then the body. Stands in for real image/audio
    * bytes; the header layout is what [[decodeMeta]] parses back.
    */
  def encodeMedia(kind: Column, width: Column, height: Column,
      nFrames: Column, body: Column): Column =
    concat(
      lit("GM").cast("binary"),
      u16(kind), u16(width), u16(height), u16(nFrames),
      body)

  /** Decode the typed metadata struct from the payload header — the
    * real-codec boundary for metadata probes (magic check included).
    */
  def decodeMeta(bytes: Column): Column =
    when(substring(bytes, 1, 2) === lit("GM").cast("binary"),
      struct(
        readU16(bytes, 3).as("kind"),
        readU16(bytes, 5).as("width"),
        readU16(bytes, 7).as("height"),
        readU16(bytes, 9).as("n_frames"),
        (length(bytes) - HeaderBytes).cast("long").as("body_bytes")))
      .otherwise(lit(null))

  /** ===STUB=== Decode the pixel/sample data. A real implementation
    * replaces this with a batched decoder (mapPartitions over payload
    * iterators, or mapInPandas from PySpark); the deterministic fake
    * hashes the body so downstream plumbing is testable end-to-end.
    */
  def decodeBodyStub(bytes: Column): Column =
    md5(substring(bytes, HeaderBytes + 1, 1 << 24))

  /** Frame sampling for video payloads: every `stride`-th byte-range
    * of the body as one "frame" (real decoder: keyframe extraction).
    * Returns array<binary> of at most `maxFrames` frames.
    */
  def sampleFrames(bytes: Column, frameBytes: Int, maxFrames: Int): Column = {
    val nAvail = floor((length(bytes) - HeaderBytes) / frameBytes).cast("int")
    val n = least(nAvail, lit(maxFrames))
    when(n <= 0, array().cast("array<binary>"))
      .otherwise(transform(sequence(lit(0), n - 1),
        f => substring(bytes, lit(HeaderBytes + 1) + f * frameBytes, lit(frameBytes))))
  }

  /** ===STUB=== Feature extraction: 4 pseudo-features from the md5 of
    * each sampled frame (real pipeline: a vision/audio encoder via a
    * batched worker). Deterministic, oracle-able.
    */
  def frameFeaturesStub(frames: Column): Column =
    transform(frames, f =>
      transform(sequence(lit(0), lit(3)),
        i => conv(substring(md5(f), i * 4 + 1, lit(4)), 16, 10).cast("long")))

  /** Resize metadata transform (pure metadata op — a real resize
    * would rewrite the payload in the decode worker).
    */
  def resizeMeta(meta: Column, maxDim: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = when(greatest(w, h) <= maxDim, lit(1.0))
      .otherwise(lit(maxDim.toDouble) / greatest(w, h))
    struct(
      floor(w * scale).cast("long").as("width"),
      floor(h * scale).cast("long").as("height"))
  }

  /** Deterministic media table derived from `documents`: one payload
    * per doc, kind = doc_id % 3 (0 image, 1 audio, 2 video), header
    * fields closed-form in doc_id so an engine-independent oracle can
    * verify the whole binary round-trip.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(
      id.as("media_id"),
      (id % 3).cast("int").as("kind_id"),
      encodeMedia(
        kind = id % 3,
        width = lit(64) + id % 64,
        height = lit(48) + id % 48,
        nFrames = lit(1) + id % 30,
        body = encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Media table with REAL format payloads, closed-form in doc_id so
    * an engine-independent oracle recomputes every decoded statistic
    * without touching a byte: kind 0 docs become binary PGM images
    * (pixel i = (id*31 + i*7) % 256 over a (16 + id%16) x (8 + id%8)
    * raster), kind 1 docs become PCM16 mono WAVs (sample i =
    * ((id*131 + i*17) % 4097) - 2048, 64 + id%128 samples, rate
    * 8000 + (id%8)*1000), kind 2 docs keep the synthetic 'GM'
    * container (the md5-fallback route — its decode IS still the
    * documented stub, and q129's output labels it fmt='gm').
    *
    * Built with a typed map rather than Column combinators: payload
    * assembly is inherently imperative byte layout. Narrow — one
    * pass, no shuffle, payloads born in their output partition.
    */
  def codecMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = (id % 3) match {
          case 0 =>
            val w = (16 + id % 16).toInt
            val h = (8 + id % 8).toInt
            Codecs.encodePgm(w, h, i => ((id * 31 + i * 7) % 256).toInt)
          case 1 =>
            val n = (64 + id % 128).toInt
            val rate = (8000 + (id % 8) * 1000).toInt
            Codecs.encodeWav(rate, n,
              i => (((id * 131 + i * 17) % 4097) - 2048).toInt)
          case _ =>
            // NULL text -> empty body (the oracle coalesces the same
            // way); without the guard every third null-text doc would
            // NPE the whole job — a data-dependent crash the planted
            // fixtures never exercise
            val body =
              (if (text == null) "" else text).getBytes("UTF-8")
            val out = new Array[Byte](HeaderBytes + body.length)
            out(0) = 'G'; out(1) = 'M'
            def p16(off: Int, v: Long): Unit = {
              out(off) = ((v >> 8) & 0xff).toByte
              out(off + 1) = (v & 0xff).toByte
            }
            p16(2, id % 3); p16(4, 64 + id % 64)
            p16(6, 48 + id % 48); p16(8, 1 + id % 30)
            System.arraycopy(body, 0, out, HeaderBytes, body.length)
            out
        }
        (id, payload)
      }
      .toDF("media_id", "payload")
  }

  /** Media table of REAL PNG payloads, closed-form in doc_id: kind 0
    * docs are 8-bit GRAYSCALE (pixel i = (id*37 + i*11) % 256), kind
    * 1 RGB and kind 2 RGBA (r = (id*13 + 3i) % 256, g = (id*17 + 5i)
    * % 256, b = (id*19 + 7i) % 256, alpha = (id + i) % 256 — present
    * in the stream, ignored by the stats), all over a (16 + id%16) x
    * (8 + id%8) raster with the scanline filter CYCLING (id + y) % 5
    * so every planted payload exercises None/Sub/Up/Average/Paeth
    * reconstruction through real zlib round-trips. The oracle
    * recomputes each decoded statistic from doc_id alone (gray value
    * or integer luma (299r + 587g + 114b)/1000), so any flaw in chunk
    * CRC-ing, inflate bookkeeping, or any filter direction
    * hash-fails the gate. Narrow, same posture as
    * [[codecMediaFromDocuments]].
    */
  def pngMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.ScanFanOut(docs).select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (16 + id % 16).toInt
        val h = (8 + id % 8).toInt
        val colorType = (id % 3) match {
          case 0 => 0
          case 1 => 2
          case _ => 6
        }
        val sample: (Int, Int) => Int =
          if (colorType == 0) (i, _) => ((id * 37 + i * 11L) % 256).toInt
          else (i, c) => c match {
            case 0 => ((id * 13 + i * 3L) % 256).toInt
            case 1 => ((id * 17 + i * 5L) % 256).toInt
            case 2 => ((id * 19 + i * 7L) % 256).toInt
            case _ => ((id + i) % 256).toInt
          }
        (id, Codecs.encodePng(w, h, colorType, sample,
          y => ((id + y) % 5).toInt))
      }
      .toDF("media_id", "payload")
  }

  /** Media table of REAL BMP payloads, closed-form in doc_id: every
    * doc becomes a 24-bit BI_RGB bitmap over a (16 + id%16) x
    * (8 + id%8) raster — r = (id*23 + 3i) % 256, g = (id*29 + 5i) %
    * 256, b = (id*31 + 7i) % 256 in IMAGE (top-down row-major) pixel
    * order — with the STORAGE orientation alternating by id parity:
    * even ids store bottom-up (the format's conventional positive
    * biHeight), odd ids top-down (negative biHeight). Both must
    * decode to the same image; the oracle's order-sensitive wsum is
    * what catches a decoder that reads either orientation wrong.
    * Narrow, same posture as [[codecMediaFromDocuments]].
    */
  /** Media table of REAL JPEG payloads, closed-form in doc_id: every
    * doc becomes a grayscale JPEG over a (16 + (id%3)·8) x
    * (8 + (id%2)·8) raster — 2 to 5 block columns by 1 or 2 block
    * rows — whose 8x8 blocks are each constant at
    * v(bi) = (id·41 + bi·59) % 256 (bi = row-major block index),
    * encoded at quality 1.0 through the JDK's ImageIO JPEG writer.
    * Block-constant at quality 1.0 is the EXACT-round-trip regime
    * (all AC coefficients identically zero, unit quantizers — see
    * [[Jpeg]]'s scaladoc; JpegSpec pins it for all 256 gray levels),
    * so the oracle recomputes every decoded statistic, including the
    * order-sensitive wsum, from doc_id alone — through a real lossy
    * codec's entropy decode, dequant, and IDCT. Blocks differ from
    * each other, so a decoder that permutes blocks (stride bug,
    * bottom-up walk) still hash-fails on wsum. Narrow, same posture
    * as [[codecMediaFromDocuments]].
    */
  def jpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (16 + (id % 3) * 8).toInt
        val h = (8 + (id % 2) * 8).toInt
        (id, Jpeg.encodeBlockGray(w, h,
          bi => ((id * 41 + bi * 59L) % 256).toInt))
      }
      .toDF("media_id", "payload")
  }

  /** Media table of REAL PGM payloads planted for the PERCEPTUAL
    * near-dup family (q140/q141): every doc becomes a 36x16 gray
    * raster that is CONSTANT on each 4x2 pixel box — i.e. constant at
    * dHash-grid granularity (9x8 boxes of 8 equal pixels each), the
    * [[Jpeg.encodeBlockGray]] treatment applied to the dHash grid —
    * so the box averages ARE the planted cell values and a DuckDB
    * oracle replays the 64-bit hash exactly.
    *
    * Docs group into SCENES of 4 (scene = id/4); variant = id%4:
    *   - v0: the base raster, cell c = (v² % 1000003) % 190 with
    *         v = (scene·2654435761 + c·40503) % 1000003. The SQUARE
    *         mix matters: the affine v alone steps ~+33 (mod 190) per
    *         cell, so gradient bits reduced to the mod-190 wrap phase
    *         — only ~190 distinct hash patterns corpus-wide, a 13%
    *         pair rate. Squaring scatters adjacent cells, so
    *         unrelated rasters land ~32 bits apart, scene patterns
    *         stay distinct for a million scenes, and pair volume is
    *         LINEAR in corpus size (3 within-scene pairs per scene);
    *   - v1: v0 + 40 everywhere — a uniform BRIGHTNESS shift, the
    *         perturbation dHash is invariant to (hamming 0 vs v0);
    *   - v2: v0 with cells 0/24/48 bumped +60 — a small LOCAL edit
    *         flipping at most 5 gradient bits (hamming <= 5 vs v0),
    *         the near-miss a perceptual hash must still pair;
    *   - v3: an unrelated raster (different multiplier family) —
    *         the non-duplicate that must NOT pair.
    * All values stay <= 250, so no bump ever clamps. Narrow, same
    * posture as [[codecMediaFromDocuments]].
    */
  def dhashMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val scene = id / 4
        val variant = id % 4
        def mix(v: Long): Int = ((v * v % 1000003L) % 190L).toInt
        def cell(c: Int): Int = {
          val base =
            mix((scene * 2654435761L + c * 40503L) % 1000003L)
          variant match {
            case 0 => base
            case 1 => base + 40
            case 2 => base + (if (c % 24 == 0) 60 else 0)
            case _ =>
              mix((scene * 1579032867L + c * 97003L + 7L) % 1000003L)
          }
        }
        (id, Codecs.encodePgm(36, 16,
          i => cell((i / 36 / 2) * 9 + (i % 36) / 4)))
      }
      .toDF("media_id", "payload")
  }

  def bmpMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (16 + id % 16).toInt
        val h = (8 + id % 8).toInt
        (id, Codecs.encodeBmp(w, h, topDown = id % 2 == 1,
          (i, c) => c match {
            case 0 => ((id * 23 + i * 3L) % 256).toInt
            case 1 => ((id * 29 + i * 5L) % 256).toInt
            case _ => ((id * 31 + i * 7L) % 256).toInt
          }))
      }
      .toDF("media_id", "payload")
  }

  /** Media table of REAL AIFF (even ids) and AU (odd ids) payloads,
    * closed-form in doc_id: PCM16 mono big-endian, sample i =
    * ((id·173 + i·19) % 4097) − 2048 over 64 + id%128 samples at rate
    * 8000 + (id%8)·1000 — the q129 WAV treatment applied to the two
    * OTHER formats `javax.sound.sampled` ships readers for. The
    * encoders are hand-written byte layout ([[Audio.encodeAiff]] with
    * the 80-bit extended rate, [[Audio.encodeAu]]); decode is the
    * JDK's codec — independent ends, so neither can mask the other.
    * Narrow, same posture as [[codecMediaFromDocuments]].
    */
  def audioMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val n = (64 + id % 128).toInt
        val rate = (8000 + (id % 8) * 1000).toInt
        val sample = (i: Int) => (((id * 173 + i * 19) % 4097) - 2048).toInt
        (id,
          if (id % 2 == 0) Audio.encodeAiff(rate, n, sample)
          else Audio.encodeAu(rate, n, sample))
      }
      .toDF("media_id", "payload")
  }
}
