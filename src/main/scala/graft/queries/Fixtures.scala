package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Planted-fixture id arithmetic, shared by every query that unions a
  * synthetic delta/near-copy/variant batch onto an organic table
  * (FIXTURES.md catalogs them).
  *
  * Why guarded: the planted ids live at `organic_id + offset`, which
  * is only collision-free while the ORGANIC id space stays below the
  * offset. Scaled replica runs (ScaleBench decades) grow the organic
  * space; past ~200x the organic ids would cross a 1e6 offset and
  * silently collide with planted ids — merging distinct rows inside
  * groupBy(id)/pair counting with no error anywhere. This helper makes
  * that failure LOUD: a row-level assert on the fixture-source side
  * (map-only, no extra max(id) scan — replicated id spaces are
  * contiguous, so any organic overflow past the offset also appears
  * among the mod-filtered fixture rows and trips the assert).
  */
object Fixtures {

  /** `id + offset`, asserting the source id sits below the offset. */
  def plantedId(id: Column, offset: Long): Column =
    when(assert_true(id >= 0L && id < offset,
        concat(lit(s"planted-fixture offset $offset is inside the " +
          "organic id space (id="), id.cast("string"),
          lit("); scaled replicas have outgrown the fixture — raise " +
            "the offset or derive it from max(id)+1"))).isNull,
      id + lit(offset))
}
