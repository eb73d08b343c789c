package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextOps._

/** Unit tests for the text-pipeline operator library (the end-to-end
  * DuckDB oracles cover the full pipelines; these pin the pieces).
  */
class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq("x").toDF("dummy").select(c).collect().head.get(0).asInstanceOf[T]
  }

  private def shingleRow(text: String, n: Int): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(wordShingles(tokens(col("text")), n).as("sh"))
      .collect().head.getSeq[String](0)
  }

  test("wordShingles: counts, distinctness, under-length edge") {
    assert(shingleRow("a b c d e", 3) == Seq("a b c", "b c d", "c d e"))
    assert(shingleRow("a b", 3).isEmpty)
    assert(shingleRow("x x x x", 3) == Seq("x x x")) // distinct
    assert(shingleRow("A  B\tc", 2) == Seq("a b", "b c")) // lower + ws split
  }

  test("md5_long60: native expression matches the conv/substring composition") {
    import spark.implicits._
    val df = Seq("alpha beta", "x", "", "日本語 text", "a b c d e f g")
      .toDF("s")
    val rows = df.select(
      call_function("md5_long60", col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("hashedShingles: fused native form matches the composed pipeline") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c d e", // exactly n tokens
      "too short", // under n -> empty
      "dup dup dup dup dup dup dup" // shingle repeats -> distinct
    ).toDF("text")
    val t = tokens(col("text"))
    val rows = df.select(
      hashedShingles(t, 5).as("fused"),
      array_distinct(hashShingles(wordShinglesRaw(t, 5))).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("native hashes == composed forms on a seeded random-unicode sweep") {
    import spark.implicits._
    // ASCII words, accents, CJK, emoji (surrogate pairs), punctuation —
    // anything whose UTF-8 encoding could diverge between the byte
    // path and the hex path
    val alphabets = Array("abcdefgh", "é漢字日本語", "😀🎉", "x1!,.-")
    val rnd = new scala.util.Random(7)
    val texts = Seq.fill(200) {
      val a = alphabets(rnd.nextInt(alphabets.length))
      Seq.fill(rnd.between(0, 12))(
        Seq.fill(rnd.between(1, 6))(a(rnd.nextInt(a.length))).mkString
      ).mkString(" ")
    }
    val t = tokens(col("text"))
    val rows = texts.toDF("text").select(
      hashedShingles(t, 3).as("fusedSh"),
      array_distinct(hashShingles(wordShinglesRaw(t, 3))).as("composedSh"),
      call_function("md5_long60", col("text")).as("nativeH"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("composedH"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
      assert(r.getLong(2) == r.getLong(3), r.toString)
    }
  }

  test("minHash: deterministic, within [0, P), monotone under containment") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog again and again")
      .toDF("text")
      .select(hashShingles(wordShingles(tokens(col("text")), 3)).as("hs"))
    val sig1 = df.select(minHash(col("hs"), 8): _*).collect().head
    val sig2 = df.select(minHash(col("hs"), 8): _*).collect().head
    assert(sig1 == sig2)
    (0 until 8).foreach { i =>
      val v = sig1.getLong(i)
      assert(v >= 0 && v < MinHashP)
    }
  }

  test("jaccard: identical, disjoint, half-overlap") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    assert(df.select(jaccard(col("a"), col("a"))).collect().head.getDouble(0) == 1.0)
    assert(df.select(jaccard(col("a"), col("b"))).collect().head.getDouble(0) == 0.5)
  }

  test("languageId: stopword argmax with deterministic ties and 'und'") {
    import spark.implicits._
    def lid(s: String): String =
      Seq(s).toDF("text").select(languageId(tokens(col("text")))).collect()
        .head.getString(0)
    assert(lid("the cat and the hat is here") == "en")
    assert(lid("el perro y la casa es grande") == "es")
    assert(lid("der hund und die katze ist da") == "de")
    assert(lid("zzz qqq www") == "und")
    // 'la de' hits both es and fr equally -> lexicographically first (es)
    assert(lid("la de") == "es")
  }

  test("withLanguageId: staged form matches scalar languageId on every case") {
    import spark.implicits._
    val texts = Seq(
      "the cat and the hat is here",
      "el perro y la casa es grande",
      "der hund und die katze ist da",
      "le chien et la maison est grande",
      "zzz qqq www",
      "la de", // es/fr tie -> lexicographically first (es)
      "")
    val df = texts.toDF("text")
    val scalar = df.select(col("text"), languageId(tokens(col("text"))).as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val staged = withLanguageId(df, col("text"), "p")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(staged == scalar)
    assert(staged("the cat and the hat is here") == "en")
    assert(staged("la de") == "es")
    assert(staged("zzz qqq www") == "und")
  }

  test("lshCandidatePairs: hot-bucket cap prunes an all-identical corpus") {
    import spark.implicits._
    // 50 docs all sharing one band key: uncapped would pair 50*49/2
    val banded = (1L to 50L).map(i => (i, "deadbeef")).toDF("doc_id", "bk")
    assert(lshCandidatePairs(banded).count() == 50L * 49 / 2)
    // cap below the bucket size drops the hot bucket entirely
    assert(lshCandidatePairs(banded, maxBucket = 10).count() == 0)
    // cap spares cold buckets alongside a hot one
    val mixed = banded.union(Seq((100L, "c0ld"), (101L, "c0ld")).toDF("doc_id", "bk"))
    val got = lshCandidatePairs(mixed, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)))
  }

  test("jaccardPairs: finds the planted near-pair, never pairs disjoint docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"), // near-dup of 1
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = jaccardPairs(docs, 0.3, shingleN = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("containmentPairs: flags the excerpt Jaccard misses, skips partial overlap") {
    import spark.implicits._
    // doc 2 = the first third of doc 1 (an excerpt): every shingle of
    // 2 appears in 1, so containment = 1.0 while Jaccard ~ 1/3 — the
    // asymmetric case a Jaccard-only pass structurally misses. doc 3
    // shares a few tokens with 1 but not 90% of its shingles.
    val parent = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    val docs = Seq(
      (1L, parent),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma unrelated tokens padding words here")
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps.containmentPairs(docs, 0.9, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 10000L,
      math.round(10000.0 * 5 / (20 + 5 - 5)))))
    // the same corpus under the Jaccard pass at the NEAR-DUP bar: the
    // excerpt pair is invisible — the reason containment exists
    val jac = jaccardPairs(docs, 0.5, shingleN = 3).collect()
    assert(jac.isEmpty)
  }

  test("contaminationPairs: asymmetric overlap, threshold, bench self-exclusion") {
    import spark.implicits._
    // bench doc 100 = a 9-token "eval item"; doc 1 embeds it verbatim
    // inside a much longer page (asymmetric: tiny Jaccard, must still
    // flag); doc 2 shares only 4 tokens (3 shingles < threshold);
    // doc 3 is disjoint
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq(
      (100L, benchText),
      (1L, ("lorem ipsum dolor sit amet " + benchText + " consectetur adipiscing elit sed do eiusmod tempor")),
      (2L, "alpha beta gamma delta unrelated words here padding more padding"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps
      .contaminationPairs(docs, isBench = col("doc_id") === 100,
        shingleN = 5, minOverlap = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 9 bench tokens -> 5 five-gram shingles, all present in doc 1
    assert(got.toSeq == Seq((1L, 100L, 5L)))
  }

  test("dedupClusters: min-label propagation across chained components") {
    import spark.implicits._
    // chain 1-2-3 (via 1-2, 2-3) and isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupClusters: long chain converges; bounded iterations fail loudly") {
    import spark.implicits._
    // path graph 1-2-...-8: min label needs diameter rounds to travel
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = dedupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet == Set(1L))
    // an iteration bound the doubling can't beat must throw, not
    // return partially-propagated labels (reach after 2 rounds is
    // ~6 hops; node 8 is still unlabelled)
    intercept[IllegalStateException] {
      dedupClusters(chain, maxIters = 2)
    }
  }

  test("dedupClusters: 1000-node chain converges in O(log n) rounds") {
    import spark.implicits._
    // the adversarial case for plain min-label propagation: a single
    // path component of diameter 999 would need ~999 rounds; pointer
    // doubling must close it in well under 25
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = dedupClusters(chain, maxIters = 25).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 0L), "every node must reach the min id")
  }

  test("simHash16: 16-bit range, identical texts collide, determinism") {
    import spark.implicits._
    val df = Seq("spark rows columns", "spark rows columns", "zz yy xx ww")
      .toDF("text")
      .select(simHash16(tokens(col("text"))).as("h"))
    val hs = df.collect().map(_.getInt(0))
    assert(hs(0) == hs(1))
    assert(hs.forall(h => h >= 0 && h < 65536))
  }

  test("withSimHash64: hex shape, limb composition, salted independence") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps"),
      (2L, "der schnelle braune fuchs")).toDF("doc_id", "text")
    val got = TextOps.withSimHash64(df, col("text"), "sim")
      .select(col("doc_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(_.matches("[0-9a-f]{16}")))
    // composition: the string is the four salted 16-bit limbs, high
    // limb (salt 3) first
    val limbs = df.select(col("doc_id") +: (0 until 4).map(j =>
        simHash16FromHashes(tokenHashes16Limb(tokens(col("text")), j))
          .as(s"l$j")): _*)
      .collect()
      .map(r => r.getLong(0) ->
        f"${r.getInt(4)}%04x${r.getInt(3)}%04x${r.getInt(2)}%04x${r.getInt(1)}%04x")
      .toMap
    assert(got == limbs)
    // the salts give genuinely independent limb families: within one
    // doc the four limbs are not all equal
    assert(got(1L).grouped(4).toSet.size > 1)
  }

  test("q78 planted PII actually matches both regexes (the plant fires)") {
    // the oracle compares Spark vs DuckDB, so a plant that matches
    // NEITHER engine's regex stays green while testing nothing
    // (round-7 review: the original phone plant was 3-4-4 digits and
    // could never match NNN-NNN-NNNN) — assert the redaction branch
    // demonstrably fires on every planted doc
    import org.apache.spark.sql.functions._
    val got = graft.queries.TextQueries
      .q78(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 9 === 0)
      .agg(count(lit(1)).as("n"),
        sum((col("n_emails") >= 1).cast("long")).as("e"),
        sum((col("n_phones") >= 1).cast("long")).as("p"))
      .head()
    assert(got.getLong(0) > 0)
    assert(got.getLong(1) == got.getLong(0),
      "some planted doc matched no email")
    assert(got.getLong(2) == got.getLong(0),
      "some planted doc matched no phone")
  }

  test("calibratedLshCandidatePairs: m8 floor drops junk collisions only") {
    import spark.implicits._
    // synthetic banded rows (doc_id, mh0..mh7, bk) hand-built so m8
    // is exact by construction: (1,2) share a band key but agree on
    // components 0,1 only — the organic-collision shape q127
    // measures at J ~ 0.01 — while (3,4) agree on 6 of 8 (a true
    // near-dup shape) and (5,6) on exactly 4 (the floor boundary,
    // must KEEP); (5,6) collide in TWO bands, pinning the distinct
    val sig = Seq(
      (1L, 10L, 11L, 1L, 2L, 3L, 4L, 5L, 6L),
      (2L, 10L, 11L, 7L, 8L, 9L, 13L, 14L, 15L),
      (3L, 20L, 21L, 22L, 23L, 24L, 25L, 96L, 97L),
      (4L, 20L, 21L, 22L, 23L, 24L, 25L, 98L, 99L),
      (5L, 30L, 31L, 32L, 33L, 50L, 51L, 52L, 53L),
      (6L, 30L, 31L, 32L, 33L, 60L, 61L, 62L, 63L))
      .toDF("doc_id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7")
    // band key = "b<i>:<mh2i>:<mh2i+1>" over 4 bands of 2 rows, the
    // q31 banding; computed here directly from the fixture columns
    val banded = sig.select(
      (col("doc_id") +: (0 until 8).map(i => col(s"mh$i"))) :+
        explode(array((0 until 4).map(b =>
          concat_ws(":", lit(s"b$b"), col(s"mh${2 * b}"),
            col(s"mh${2 * b + 1}"))): _*)).as("bk"): _*)
    val kept = calibratedLshCandidatePairs(banded, 4)
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((3L, 4L), (5L, 6L)),
      s"floor 4 must drop exactly the m8=2 junk pair, kept $kept")
    // the floor is a PRE-confirm optimization: on the gate corpus it
    // must not change q31's output (q127: every J >= 0.5 pair sits
    // at m8 >= 4) — proven end-to-end by the DuckDB gate, pinned
    // here for the mechanism: floor 0 admits every banded collision
    val all = calibratedLshCandidatePairs(banded, 0)
      .as[(Long, Long)].collect().toSet
    assert(all == Set((1L, 2L), (3L, 4L), (5L, 6L)))
  }
}
