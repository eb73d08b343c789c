package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for shuffle joins and aggregations.
  *
  * At 100 TB a handful of hot keys (one airport, one boilerplate
  * document) can pin an entire stage on one task. AQE's skew-join
  * splitting handles sort-merge joins when enabled; this operator is
  * the explicit, planner-independent form: spread each hot fact key
  * over `salts` sub-keys and replicate the (small-side) build rows to
  * every sub-key, so the join shuffles to `salts` tasks per key.
  */
object Skew {

  /** Equi join `fact ⋈ dim` on `key`, salted: fact rows get a
    * deterministic salt from `saltSrc` (any roughly-uniform column,
    * e.g. a row id — NOT the join key), dim rows are replicated once
    * per salt. Results are identical to the plain join; only the
    * shuffle layout changes.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltSrc: Column): DataFrame = {
    // NULL saltSrc must still land in some sub-key (a null salt would
    // silently drop the row from the inner join)
    val sf = fact.withColumn("__salt",
      coalesce(pmod(saltSrc, lit(salts)), lit(0)).cast("int"))
    // generator must be top-level in the projection (no cast wrapper);
    // sequence(int, int) already yields array<int>
    val sd = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }
}
