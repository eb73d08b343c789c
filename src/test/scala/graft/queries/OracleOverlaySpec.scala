package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The per-dir oracle overlay must be the IDENTITY at driver gate
  * SFs: the derived SRP plane count equals the static 8-plane config
  * there, so Verify's overlayed oracle_sql.json is byte-identical to
  * the static map and the driver's gate semantics are untouched. The
  * overlay only diverges on replica dirs past the 2048/side
  * boundary — which is exactly the point.
  */
class OracleOverlaySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("overlay is the identity at every driver gate SF") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { dir =>
      val o = VectorQueries.alignOracleOverlay(spark, dir)
      assert(o.keySet == Set("q122_banded_align", "q123_align_recall"))
      assert(o("q122_banded_align") == VectorQueries.q122Sql,
        s"$dir: q122 overlay diverged from the static 8-plane oracle")
      assert(o("q123_align_recall") == VectorQueries.q123Sql,
        s"$dir: q123 overlay diverged from the static 8-plane oracle")
    }
  }

  test("parameterized oracle really varies with the plane count") {
    // not equal, and the deeper config mentions more sign terms
    val p8 = VectorQueries.q122SqlFor(8)
    val p11 = VectorQueries.q122SqlFor(11)
    assert(p8 == VectorQueries.q122Sql)
    assert(p8 != p11 && p11.length > p8.length)
  }
}
