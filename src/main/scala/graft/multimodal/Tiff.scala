package graft.multimodal

/** TIFF/EXIF-style IFD metadata probe — the image twin of [[Mp4]]'s
  * container walk: camera pipelines and image-curation jobs read
  * width/height/orientation/make out of the IFD (the structure EXIF
  * embeds) without decoding pixels, so resolution filters and
  * orientation normalization run as metadata passes.
  *
  * The real differentiator this probe must get right is ENDIANNESS:
  * TIFF carries its own byte order ("II" little-endian / "MM"
  * big-endian) and every u16/u32 in the file — including the IFD
  * entry fields and inline SHORT values — obeys it. The planted
  * corpus alternates both orders, so an engine that hard-codes one
  * hash-fails half the gate. ASCII tags (Make) dereference their
  * value offset like real writers emit them.
  *
  * Both ends are hand-written here (the JDK ships no TIFF parser);
  * the cross-check is the DuckDB oracle recomputing every field and
  * the order-sensitive tag wsum closed-form from doc_id (the
  * q129/q151 posture).
  *
  * Reference posture: the reference (ngafid_cpat) has no media path;
  * §2.11 multimodal extension (SURVEY.md).
  */
object Tiff {

  /** TIFF magic: "II" + 42le or "MM" + 42be. */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  final case class TiffMeta(media_id: Long, endian: String, width: Long,
      height: Long, bps: Long, orientation: Long, make: String,
      n_entries: Long, wsum_tags: Long)

  // tag ids (TIFF 6.0 baseline / EXIF)
  private val TagWidth = 256
  private val TagHeight = 257
  private val TagBps = 258
  private val TagMake = 271
  private val TagOrientation = 274

  /** Probe a payload; None on malformation (bad magic, IFD out of
    * bounds, unsorted tags, truncated ASCII values).
    */
  def probe(mediaId: Long, b: Array[Byte]): Option[TiffMeta] = {
    if (!sniff(b)) return None
    val le = b(0) == 'I'
    def u16(off: Int): Int =
      if (off + 2 > b.length) -1
      else if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (off + 4 > b.length) -1L
      else if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + n * 12 + 4 > b.length) return None
    var width = -1L; var height = -1L; var bps = -1L
    var orientation = -1L; var make: String = null
    var wsum = 0L
    var prevTag = -1
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      val tag = u16(e)
      if (tag <= prevTag) return None // spec: ascending tag order
      prevTag = tag
      wsum += i.toLong * tag
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      tag match {
        case TagWidth if typ == 3 => width = u16(e + 8).toLong
        case TagWidth if typ == 4 => width = u32(e + 8)
        case TagHeight if typ == 3 => height = u16(e + 8).toLong
        case TagHeight if typ == 4 => height = u32(e + 8)
        case TagBps if typ == 3 => bps = u16(e + 8).toLong
        case TagOrientation if typ == 3 => orientation = u16(e + 8).toLong
        case TagMake if typ == 2 =>
          // ASCII: count includes the NUL; value dereferenced unless
          // it fits inline (count <= 4) — real writers use offsets
          val off = if (cnt <= 4) e + 8 else u32(e + 8).toInt
          if (cnt < 1 || off < 0 || off + cnt > b.length) return None
          make = new String(b, off, cnt.toInt - 1, "US-ASCII")
        case _ => ()
      }
      i += 1
    }
    if (width < 0 || height < 0 || make == null) return None
    Some(TiffMeta(mediaId, if (le) "II" else "MM", width, height,
      math.max(bps, 0L), math.max(orientation, 0L), make, n.toLong, wsum))
  }

  /** Hand-written baseline TIFF: header, one IFD at offset 8 with the
    * five tags in ascending order (SHORT values inline), the Make
    * ASCII value stored after the IFD at its dereferenced offset.
    */
  def encode(littleEndian: Boolean, width: Int, height: Int, bps: Int,
      orientation: Int, make: String): Array[Byte] = {
    val nEntries = 5
    val ifdBytes = 2 + nEntries * 12 + 4
    val makeBytes = make.length + 1 // + NUL
    val out = new Array[Byte](8 + ifdBytes + makeBytes)
    var off = 0
    def p16(v: Int): Unit = {
      if (littleEndian) { out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte }
      else { out(off) = ((v >> 8) & 0xff).toByte
        out(off + 1) = (v & 0xff).toByte }
      off += 2
    }
    def p32(v: Long): Unit = {
      if (littleEndian)
        (0 until 4).foreach(i => out(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      else
        (0 until 4).foreach(i => out(off + i) = ((v >> (8 * (3 - i))) & 0xff).toByte)
      off += 4
    }
    // header
    if (littleEndian) { out(0) = 'I'; out(1) = 'I'; out(2) = 42; out(3) = 0 }
    else { out(0) = 'M'; out(1) = 'M'; out(2) = 0; out(3) = 42 }
    off = 4
    p32(8L) // IFD0 offset
    p16(nEntries)
    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      p16(tag); p16(typ); p32(cnt)
      val before = off
      value
      // SHORT inline values occupy 2 of the 4 value bytes; pad
      while (off < before + 4) { out(off) = 0; off += 1 }
    }
    entry(TagWidth, 3, 1L) { p16(width) }
    entry(TagHeight, 3, 1L) { p16(height) }
    entry(TagBps, 3, 1L) { p16(bps) }
    entry(TagMake, 2, makeBytes.toLong) { p32(8L + ifdBytes) }
    entry(TagOrientation, 3, 1L) { p16(orientation) }
    p32(0L) // next IFD: none
    make.getBytes("US-ASCII").copyToArray(out, off)
    out(off + make.length) = 0
    out
  }
}
