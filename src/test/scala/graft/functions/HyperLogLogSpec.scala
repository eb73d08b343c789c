package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HyperLogLogSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("golden: hash/register/rank agree with the md5-60 convention") {
    // independently derived (python hashlib md5, first 15 hex digits)
    val golden = Seq( // key, h, idx (h % 128), rho (54 - bitlen(h/128))
      (0L, 505250903673190457L, 57, 2),
      (1L, 820877203339820825L, 25, 1),
      (42L, 1136880945344389893L, 5, 1),
      (123456789L, 483975434513820439L, 23, 2))
    for ((k, h, idx, rho) <- golden) {
      assert(HllUtil.hash(k) == h, s"hash($k)")
      assert((h % 128).toInt == idx)
      assert(61 - 7 - HllUtil.bitlen(h / 128) == rho)
      val buf = new HllBuffer(7)
      buf.add(k)
      assert(buf.regs(idx) == rho.toByte &&
        buf.regs.map(_.toInt).sum == rho, s"register write for key $k")
    }
  }

  test("estimate tracks true cardinality across decades (raw branch)") {
    for (n <- Seq(1000, 10000, 100000)) {
      val buf = new HllBuffer(7)
      (0 until n).foreach(k => buf.add(k.toLong))
      val est = HllUtil.cardinality(buf.p, buf.regs)
      // p=7 -> ~9.2% standard error; 3 sigma
      assert(math.abs(est - n).toDouble / n < 0.28,
        s"n=$n est=$est (${math.abs(est - n).toDouble / n})")
    }
  }

  test("small-range linear counting branch: near-exact at tiny n") {
    val buf = new HllBuffer(7)
    (0 until 20).foreach(k => buf.add(k.toLong))
    val est = HllUtil.cardinality(buf.p, buf.regs)
    assert(math.abs(est - 20) <= 2, s"linear counting est=$est for n=20")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val once = new HllBuffer(7)
    (0 until 5000).foreach(k => once.add(k.toLong))
    val thrice = new HllBuffer(7)
    (0 until 3).foreach(_ => (0 until 5000).foreach(k => thrice.add(k.toLong)))
    assert(HllUtil.toBytes(once.p, once.regs)
      .sameElements(HllUtil.toBytes(thrice.p, thrice.regs)))
  }

  test("null keys are skipped, not hashed as a sentinel value") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val withNulls = (Seq[Option[Long]](None, None) ++
      (0 until 500).map(k => Some(k.toLong))).toDF("k")
    val clean = (0 until 500).map(_.toLong).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(call_function("hll_build", col("k"), lit(7)))
        .head().getAs[Array[Byte]](0)
    assert(sk(withNulls).sameElements(sk(clean)),
      "null keys must not perturb the registers")
  }

  test("build is byte-identical under any partitioning (max-merge)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val keys = (0 until 20000).map(_.toLong * 7919L)
    def build(parts: Int): Array[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(call_function("hll_build", col("k"), lit(7)))
        .head().getAs[Array[Byte]](0)
    val one = build(1)
    for (parts <- Seq(3, 7, 16)) {
      assert(build(parts).sameElements(one),
        s"sketch differs at $parts partitions")
    }
    // and the idempotence bonus max-merge buys over CMS addition:
    // re-merging a partial into itself changes nothing
    val (p, regs) = HllUtil.fromBytes(one)
    val doubled = new HllBuffer(p, regs.clone())
    doubled.max(new HllBuffer(p, regs.clone()))
    assert(doubled.regs.sameElements(regs))
  }

  test("sql surface: hll_card/hll_regsum match HllUtil on a grouped build") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = (0 until 4000).map(i => (i % 4, i.toLong)).toDF("g", "k")
      .groupBy(col("g"))
      .agg(call_function("hll_build", col("k"), lit(7)).as("sk"))
      .select(col("g"), col("sk"),
        call_function("hll_card", col("sk")).as("card"),
        call_function("hll_regsum", col("sk")).as("rs"))
    df.collect().foreach { r =>
      val (p, regs) = HllUtil.fromBytes(r.getAs[Array[Byte]]("sk"))
      assert(r.getAs[Long]("card") == HllUtil.cardinality(p, regs))
      assert(r.getAs[Long]("rs") == HllUtil.regSum(p, regs))
      val est = r.getAs[Long]("card")
      assert(math.abs(est - 1000).toDouble / 1000 < 0.28, s"group est $est")
    }
  }

  test("q84 fixture stays far inside the raw-estimator branch at both SFs") {
    // the oracle's ln branch mirrors HllUtil but is the one float op
    // the engines could disagree on in the last ulp — this pins the
    // invariant that keeps it unfired: every group's estimate sits
    // well above the 2.5m = 320 linear-counting threshold, with >2x
    // margin against fixture drift, at the gate SFs
    for (sf <- Seq("0.001", "0.01")) {
      val rows = graft.queries.Relational
        .q84(spark, s"/root/testdata/sf$sf").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (exact, est) = (r.getLong(1), r.getLong(2))
        assert(exact > 640 && est > 640,
          s"sf$sf group ${r.getString(0)}: exact=$exact est=$est — " +
            "the fixture is drifting toward the linear-counting branch")
      }
    }
  }

  test("p outside [4,16] is rejected at analysis") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(1L).toDF("k")
    for (bad <- Seq(3, 17)) {
      val e = intercept[Exception] {
        df.agg(call_function("hll_build", col("k"), lit(bad))).collect()
      }
      assert(e.getMessage.contains("hll_build"), e.getMessage)
    }
  }

  test("hll_merge of fine sketches equals a direct build, byte-for-byte") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // overlapping key ranges across fine groups — the case where
    // rolling up exact counts double-counts and max-merge must not
    val rows = (0 until 3).flatMap(g =>
      (g * 500 until g * 500 + 1500).map(k => (g, k.toLong)))
    val fine = rows.toDF("g", "k")
      .groupBy(col("g"))
      .agg(call_function("hll_build", col("k"), lit(7)).as("sk"))
    val merged = fine
      .agg(call_function("hll_merge", col("sk")).as("msk"))
      .head().getAs[Array[Byte]]("msk")
    val direct = rows.toDF("g", "k")
      .agg(call_function("hll_build", col("k"), lit(7)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(merged.sameElements(direct),
      "merged register grid diverged from the direct build")
  }

  test("hll_merge skips nulls and yields null on an all-null group") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val sk = Seq(1L, 2L, 3L).toDF("k")
      .agg(call_function("hll_build", col("k"), lit(7)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val mixed = Seq(Option(sk), None).toDF("sk")
      .agg(call_function("hll_merge", col("sk")).as("m"))
      .head().getAs[Array[Byte]]("m")
    assert(mixed.sameElements(sk), "null input must not perturb the merge")
    val allNull = Seq[Option[Array[Byte]]](None, None).toDF("sk")
      .agg(call_function("hll_merge", col("sk")).as("m"))
      .head()
    assert(allNull.isNullAt(0), "all-null group must merge to null")
  }

  test("hll_merge rejects mixed sketch widths loudly") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def skAt(p: Int) = Seq(1L, 2L).toDF("k")
      .agg(call_function("hll_build", col("k"), lit(p)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val e = intercept[Exception] {
      Seq(skAt(7), skAt(8)).toDF("sk")
        .repartition(1)
        .agg(call_function("hll_merge", col("sk")).as("m"))
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("mixed sketch widths") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("mixed sketch widths")),
      s"expected the width-mismatch error, got: ${e.getMessage}")
  }
}
