package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Pins the native QuantizeExpr kernel bit-identical to the
  * declarative transform/zip_with/filter formulation it replaced in
  * `embed_quantize` — including the rounding edge Spark's Round
  * resolves through the shortest-decimal representation (naive
  * floor(v+0.5) gets 0.49999999999999994 wrong) and the zero-vector /
  * negative-tie shapes.
  */
class QuantizeExprSpec extends SparkSpec {

  import spark.implicits._

  /** The exact declarative form embed_quantize used before the kernel. */
  private def declarative(df: DataFrame): DataFrame = {
    val e = col("embedding")
    val absmax = array_max(transform(e, x => abs(x.cast("double"))))
    df.withColumn("scale",
        when(absmax > 0, lit(127.0) / absmax).otherwise(lit(0.0)))
      .withColumn("q", transform(e, x =>
        round(x.cast("double") * col("scale")).cast("int")))
      .select(col("id"),
        size(e).as("n_dims"),
        col("scale"),
        size(filter(col("q"), v => v === 0)).as("n_zero"),
        when(col("scale") > 0,
          array_max(zip_with(e, col("q"), (x, v) =>
            abs(x.cast("double") - v.cast("double") / col("scale")))))
          .otherwise(lit(0.0)).as("max_abs_err"))
  }

  private def native(df: DataFrame): DataFrame =
    df.withColumn("qs", QuantizeExpr.quantizeStats(col("embedding")))
      .select(col("id"),
        col("qs.n_dims").as("n_dims"),
        col("qs.scale").as("scale"),
        col("qs.n_zero").as("n_zero"),
        col("qs.max_abs_err").as("max_abs_err"))

  private def assertIdentical(vecs: Seq[Array[Float]]): Unit = {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
    val mismatches = native(df).as("n")
      .join(declarative(df).as("d"), Seq("id"))
      .filter(
        !($"n.n_dims" <=> $"d.n_dims") || !($"n.scale" <=> $"d.scale") ||
        !($"n.n_zero" <=> $"d.n_zero") ||
        !($"n.max_abs_err" <=> $"d.max_abs_err"))
      .count()
    assert(mismatches == 0L)
  }

  test("kernel == declarative on crafted edge vectors") {
    // x * (127/absmax) in double is EXACTLY 0.49999999999999994 (the
    // largest double < 0.5): Spark's Round (shortest-decimal HALF_UP)
    // gives 0 where a naive floor(v + 0.5) gives 1. Guard below keeps
    // the pair honest — a float literal like 0.49999999999999994f
    // silently rounds to 0.5f and never exercises the edge.
    val edgeX = 0.8174819946289062f
    val edgeMax = 207.6404266357422f
    assert(edgeX.toDouble * (127.0 / edgeMax.toDouble)
      == 0.49999999999999994)
    assert(math.floor(edgeX.toDouble * (127.0 / edgeMax.toDouble) + 0.5)
      == 1.0)
    assertIdentical(Seq(
      Array(0f, 0f, 0f),                       // zero vector: scale 0
      Array(1f),                                // absmax element: err 0
      Array(-2.5f, 2.5f, 0.5f, -0.5f),          // exact .5 products
      Array(edgeX, edgeMax),                    // shortest-decimal round
      Array(1e-30f, 1f),                        // q rounds to 0
      Array(-1f, -127f, 63.5f),                 // negative absmax path
      Array(Float.MinPositiveValue, Float.MaxValue)))
  }

  test("NaN propagates with Spark comparison semantics") {
    // Spark ranks NaN greater than any double, so absmax = NaN takes
    // the 127/absmax branch: scale = NaN, max_abs_err = NaN, and each
    // q_i = (NaN).toInt = 0. The declarative form cannot express this:
    // under ANSI (this engine's config) its round(..).cast("int")
    // throws on NaN — pinned here so the kernel's extension of the
    // declarative semantics stays deliberate.
    val df = Seq((1L, Array(Float.NaN, 1f))).toDF("id", "embedding")
    val r = native(df).head()
    assert(r.getAs[Int]("n_dims") == 2)
    assert(r.getAs[Double]("scale").isNaN)
    assert(r.getAs[Int]("n_zero") == 2)
    assert(r.getAs[Double]("max_abs_err").isNaN)
    val thrown = intercept[Exception] { declarative(df).collect() }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(thrown).exists(_.getMessage != null)
      && chain(thrown).map(t => Option(t.getMessage).getOrElse(""))
        .exists(_.contains("CAST_OVERFLOW")))
  }

  test("infinite component: scale collapses to 0 like declarative") {
    // absmax = +Inf gives scale = 127/Inf = 0.0 on both paths; the
    // kernel additionally stays total on the Inf*0 = NaN product
    // (q = 0) where the declarative cast would throw under ANSI.
    val df = Seq((1L, Array(Float.PositiveInfinity, 1f)))
      .toDF("id", "embedding")
    val r = native(df).head()
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getAs[Int]("n_zero") == 2)
    assert(r.getAs[Double]("max_abs_err") == 0.0)
  }

  test("kernel == declarative for arbitrary float vectors") {
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(Gen.listOfN(8, vecGen)) { vs =>
        vs.isEmpty || { assertIdentical(vs); true }
      })
    assert(res.passed, res.status.toString)
  }

  test("SQL surface: quantize_stats registered") {
    graft.GraftExtensions.register(spark)
    Seq((1L, Array(1f, -2f))).toDF("id", "embedding")
      .createOrReplaceTempView("qz_t")
    val r = spark.sql(
      "SELECT quantize_stats(embedding).n_zero AS z FROM qz_t")
      .as[Int].head()
    assert(r == 0)
  }
}
