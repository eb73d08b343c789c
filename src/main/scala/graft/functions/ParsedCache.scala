package graft.functions

import org.apache.spark.broadcast.Broadcast

/** Bounded per-executor cache of PARSED broadcast payloads, shared by
  * the sketch probes ([[BloomProbe]], [[CmsQuery]]). Broadcast.value
  * already caches the bytes per executor; this avoids re-parsing the
  * geometry per row.
  *
  * Keyed by the Broadcast OBJECT (identity — Broadcast does not
  * override equals), NOT by `bc.id`: broadcast ids restart at 0 when
  * a SparkContext is recreated in the same JVM, and an id-keyed
  * JVM-static map would silently serve the previous context's sketch
  * for the new context's broadcast — wrong data, no error.
  *
  * BOUNDED: entries are re-parseable, so on overflow the whole map is
  * cleared — worst case one re-parse per live filter, never a leak
  * (payloads can be tens of MB at the top of the size caps).
  */
private[functions] final class ParsedCache[T <: AnyRef](max: Int = 8) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Broadcast[Array[Byte]], T]()

  def get(bc: Broadcast[Array[Byte]], parse: Array[Byte] => T): T = {
    var p = cache.get(bc)
    if (p == null) {
      if (cache.size >= max) cache.clear()
      p = cache.computeIfAbsent(bc, b => parse(b.value))
    }
    p
  }
}
