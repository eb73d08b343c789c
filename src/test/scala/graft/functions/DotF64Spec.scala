package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.vector.VectorOps

class DotF64Spec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("native dot_f64 is bit-identical to the HOF fold and seqDot") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    got.zip(rows).foreach { case (r, (a, b)) =>
      // == on doubles: BIT-identical, not approximately equal — the
      // whole oracle story rests on the fold order being the same
      assert(r.getDouble(0) == r.getDouble(1), "native != HOF fold")
      assert(r.getDouble(0) == VectorOps.seqDot(a, b), "native != seqDot")
    }
  }

  test("dot_f64 stays inside whole-stage codegen, unlike the HOF fold") {
    // parquet-backed arrays (a literal Seq folds to LocalTableScan
    // with no codegen span; transform()-built arrays are themselves
    // CodegenFallback and evict the projection). toString marks a
    // codegen'd operator with the `*(n)` prefix.
    val base = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val native = base.select(VectorOps.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[dot_f64""".r.findFirstIn(native).isDefined,
      s"the dot_f64 projection must be codegen'd (*(n) Project):\n$native")
    val hof = base.select(VectorOps.dotHof(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[aggregate""".r.findFirstIn(hof).isEmpty &&
      hof.contains("Project [aggregate"),
      s"expected the HOF-fold projection itself to be non-codegen:\n$hof")
  }

  test("dot_f64 fails loud on a length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("dot_f64 fails loud on a null array ELEMENT (never reads it as 0.0)") {
    // the HOF fold would propagate NULL here; silently treating the
    // slot as 0.0 is the divergence the guard closes
    import spark.implicits._
    val df = Seq((Seq(Option(1.0), Option.empty[Double]), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null element")), s"got: ${msgs(e)}")
  }

  test("dot_f64 builder rejects wrong arity with a clear error") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0)).toDF("a")
    val e = intercept[Exception] {
      df.select(call_function("dot_f64", col("a"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exactly two")), s"got: ${msgs(e)}")
  }

  test("dot_f64 is null on a null input array") {
    import spark.implicits._
    val df = Seq((Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }
}
