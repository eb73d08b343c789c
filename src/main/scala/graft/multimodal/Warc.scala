package graft.multimodal

/** The WARC-ish record graft's gzip container fronts carry — one
  * crawl page per gzip member: a `WARC/1.0` header block with the
  * record id (`urn:graft:d<id>`) and the target URI, a blank line,
  * then the page bytes. ONE definition shared by the batch query
  * (q163) and the streaming service ([[graft.streaming.ShardIngest
  * .warcCurationIngest]]) so the two cannot drift — the q160/q161
  * rule applied to the record format itself.
  *
  * This is the id+URI subset of real WARC (ISO 28500) a curation
  * pipeline needs, not a full WARC implementation: no
  * Content-Length framing (the gzip member boundary frames the
  * record — Common Crawl's layout), no record types beyond response
  * pages. Honest scope, stated.
  */
object Warc {

  private val RecIdRe = "urn:graft:d(\\d+)".r
  private val UriRe = "WARC-Target-URI: ([^\r\n]*)".r

  /** One record's bytes. */
  def encode(docId: Long, url: String, html: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Record-ID: urn:graft:d$docId\r\n" +
      s"WARC-Target-URI: $url\r\n\r\n$html").getBytes("UTF-8")

  /** (doc_id, url, html), or None for a record without the WARC
    * header block, the graft record id, or the target URI — the
    * container walk already verified the BYTES (CRC + framing), so a
    * None here is a foreign/unparsable record, not corruption, and
    * quarantines at record granularity rather than shard-whole.
    */
  def parse(body: Array[Byte]): Option[(Long, String, String)] = {
    val s = new String(body, "UTF-8")
    val cut = s.indexOf("\r\n\r\n")
    if (cut < 0 || !s.startsWith("WARC/")) return None
    val hdr = s.take(cut)
    for {
      m <- RecIdRe.findFirstMatchIn(hdr)
      u <- UriRe.findFirstMatchIn(hdr)
    } yield (m.group(1).toLong, u.group(1), s.drop(cut + 4))
  }
}
