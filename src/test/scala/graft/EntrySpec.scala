package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's smoke check: the flagship entry() must return
  * rows on sf0.001, and every registered query must have either an
  * oracle or an explicit rows-only justification.
  */
class EntrySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("entry(): flagship approach pipeline returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.length == 18)
  }

  test("query registry: oracle coverage and key hygiene") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    // every oracle refers to a registered query
    assert(os.keySet.subsetOf(qs.keySet))
    // every query is oracled (q20's state machine got a closed-form
    // oracle in round 3 — keep this exhaustive)
    assert((qs.keySet -- os.keySet).isEmpty,
      s"oracle-less queries: ${qs.keySet -- os.keySet}")
  }
}
