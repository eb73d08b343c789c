package graft.functions

import org.apache.spark.broadcast.Broadcast

/** Bounded per-executor cache of PARSED broadcast payloads, shared by
  * the sketch probes ([[BloomProbe]], [[CmsQuery]]). Broadcast.value
  * already caches the bytes per executor; this avoids re-parsing the
  * geometry per row.
  *
  * Keying, carefully: each TASK deserializes its own Broadcast
  * wrapper object (codegen references ship with the task binary), so
  * keying by object identity would miss on every task — parsing would
  * amortize per-row but not per-executor, and dead wrappers would pin
  * parsed payloads until an overflow clear. Keying by `bc.id` ALONE
  * is wrong the other way: broadcast ids restart at 0 when a
  * SparkContext is recreated in the same JVM, and a JVM-static map
  * would silently serve the previous context's sketch for the new
  * context's broadcast — wrong data, no error. So the key is
  * (application id, broadcast id): the app id changes with every new
  * SparkContext, making the pair unique across restarts, while every
  * task of one app sharing a broadcast hits the same entry —
  * per-executor amortization, the thing this cache is for.
  *
  * BOUNDED: entries are re-parseable, so on overflow the whole map is
  * cleared — worst case one re-parse per live filter, never a leak
  * (payloads can be tens of MB at the top of the size caps). At most
  * `max` parsed payloads are ever pinned, including any from an
  * already-destroyed context (they age out on the next overflow).
  */
private[functions] final class ParsedCache[T <: AnyRef](max: Int = 8) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), T]()

  private def appId: String = {
    val env = org.apache.spark.SparkEnv.get
    // SparkEnv is set on the driver and on every executor while a
    // context is alive; a broadcast can only be read under one. The
    // empty-string fallback keeps a bare unit-test eval working.
    if (env == null) "" else env.conf.getOption("spark.app.id").getOrElse("")
  }

  def get(bc: Broadcast[Array[Byte]], parse: Array[Byte] => T): T = {
    val key = (appId, bc.id)
    var p = cache.get(key)
    if (p == null) {
      if (cache.size >= max) cache.clear()
      p = cache.computeIfAbsent(key, _ => parse(bc.value))
    }
    p
  }
}
