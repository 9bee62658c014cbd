package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MvRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
  }

  /** sales(region, channel, amount, qty) with nulls in one measure. */
  private lazy val basePath: String = {
    val dir = tmpDir("mv-base") + "/sales"
    (0 until 5000).map { i =>
      (s"r${i % 7}", s"c${i % 3}", i * 1.25,
        if (i % 11 == 0) None else Some(i.toLong % 97))
    }.toDF("region", "channel", "amount", "qty")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def createView(): String = {
    val viewPath = tmpDir("mv-view") + "/sales_by_rc"
    Mv.create(spark, basePath, viewPath, Seq("region", "channel"),
      Seq(Mv.Measure("amount", Some("decimal(18,2)")), Mv.Measure("qty")))
    viewPath
  }

  private def q(): DataFrame =
    spark.read.parquet(basePath)
      .groupBy($"region", $"channel")
      .agg(count(lit(1)).as("n"),
        sum($"amount".cast("decimal(18,2)")).as("amt"),
        min($"qty").as("min_q"), max($"qty").as("max_q"))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("grouped aggregate rewrites to the view with identical results") {
    val viewPath = createView()
    try {
      val expected = rows(q()) // no rule
      withRule {
        val df = q()
        assert(Mv.readsView(df, viewPath),
          df.queryExecution.optimizedPlan.toString)
        assert(!Mv.readsView(df, basePath))
        assert(rows(df) == expected)
      }
    } finally Mv.deregister(basePath)
  }

  test("rollup to a subset of view keys and a group-column filter") {
    val viewPath = createView()
    try withRule {
      val sub = spark.read.parquet(basePath)
        .filter($"channel" =!= "c1")
        .groupBy($"region")
        .agg(sum($"amount".cast("decimal(18,2)")).as("amt"),
          count(lit(1)).as("n"))
      assert(Mv.readsView(sub, viewPath),
        sub.queryExecution.optimizedPlan.toString)
      Mv.deregister(basePath)
      assert(rows(sub) == rows(spark.read.parquet(basePath)
        .filter($"channel" =!= "c1")
        .groupBy($"region")
        .agg(sum($"amount".cast("decimal(18,2)")).as("amt"),
          count(lit(1)).as("n"))))
    } finally Mv.deregister(basePath)
  }

  test("global aggregate (no grouping) derives count from partials") {
    val viewPath = createView()
    try withRule {
      val g = spark.read.parquet(basePath)
        .agg(count(lit(1)).as("n"), max($"qty").as("mx"))
      assert(Mv.readsView(g, viewPath),
        g.queryExecution.optimizedPlan.toString)
      val r = g.collect().head
      assert(r.getAs[Long]("n") == 5000L)
      assert(r.getAs[Long]("mx") == 96L)
    } finally Mv.deregister(basePath)
  }

  test("non-derivable shapes are left on the base plan") {
    val viewPath = createView()
    try withRule {
      val distinctAgg = spark.read.parquet(basePath)
        .groupBy($"region").agg(countDistinct($"channel").as("nc"))
      assert(!Mv.readsView(distinctAgg, viewPath))

      // different cast than the view stores: must NOT be approximated
      val otherCast = spark.read.parquet(basePath)
        .groupBy($"region").agg(sum($"amount".cast("decimal(12,2)")).as("a"))
      assert(!Mv.readsView(otherCast, viewPath))

      // raw double sum was never declared as a measure
      val rawSum = spark.read.parquet(basePath)
        .groupBy($"region").agg(sum($"amount").as("a"))
      assert(!Mv.readsView(rawSum, viewPath))

      // filter on a non-group column prunes rows INSIDE groups
      val rowFilter = spark.read.parquet(basePath)
        .filter($"qty" > 50).groupBy($"region").agg(count(lit(1)).as("n"))
      assert(!Mv.readsView(rowFilter, viewPath))
      assert(Mv.readsView(rowFilter, basePath))
    } finally Mv.deregister(basePath)
  }

  test("SELECT DISTINCT on group columns reads only the view") {
    val viewPath = createView()
    try {
      val expected = rows(
        spark.read.parquet(basePath).select($"region", $"channel").distinct())
      withRule {
        val d = spark.read.parquet(basePath)
          .select($"region", $"channel").distinct()
        assert(Mv.readsView(d, viewPath),
          d.queryExecution.optimizedPlan.toString)
        assert(rows(d) == expected)
      }
    } finally Mv.deregister(basePath)
  }

  test("non-deterministic filters and count(NULL) stay on the base") {
    val viewPath = createView()
    try withRule {
      // rand() has no references but samples per ROW — rewriting onto
      // the one-row-per-group partial table would sample per GROUP
      val sampled = spark.read.parquet(basePath)
        .filter($"region" === "r1" && rand(7) < 0.5)
        .groupBy($"region").agg(count(lit(1)).as("n"))
      assert(!Mv.readsView(sampled, viewPath))

      // count skips nulls: count(NULL) is 0, never the group row
      // count. Catalyst folds it to literal 0 before this rule runs
      // (making a view-served plan value-correct too); the rule's own
      // non-null literal guard covers plans that arrive unfolded.
      val cn = spark.read.parquet(basePath)
        .groupBy($"region").agg(count(lit(null)).as("n"))
      assert(cn.select(max($"n")).head().getLong(0) == 0L)
    } finally Mv.deregister(basePath)
  }

  test("Mv.create refresh while registered rebuilds from the BASE, not the stale view") {
    val dir = tmpDir("mv-refresh") + "/t"
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val viewPath = tmpDir("mv-refresh-view") + "/view"
    def createV(): Unit = Mv.create(spark, dir, viewPath,
      Seq("k"), Seq(Mv.Measure("v", Some("decimal(18,2)"))))
    createV()
    try withRule {
      // base grows; refresh the view WITHOUT deregistering first —
      // create's own aggregate must not be served from the stale view
      Seq(("a", 10.0), ("c", 5.0)).toDF("k", "v")
        .write.mode("append").parquet(dir)
      createV()
      val df = spark.read.parquet(dir)
        .groupBy($"k").agg(count(lit(1)).as("n"),
          sum($"v".cast("decimal(18,2)")).as("s"))
      assert(Mv.readsView(df, viewPath),
        df.queryExecution.optimizedPlan.toString)
      val got = df.collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap
      assert(got == Map(
        "a" -> ((2L, "11.00")), "b" -> ((1L, "2.00")),
        "c" -> ((1L, "5.00"))))
    } finally Mv.deregister(dir)
  }

  test("avg over a DECIMAL measure rewrites bit-exactly; count(col) " +
      "rolls the non-null partial up (r12)") {
    val viewPath = createView()
    def q2() = spark.read.parquet(basePath)
      .groupBy($"region")
      .agg(avg($"amount".cast("decimal(18,2)")).as("avg_amt"),
        count($"qty").as("n_qty"), count(lit(1)).as("n"))
    try {
      val expected = rows(q2()) // no rule: the base aggregation
      withRule {
        val df = q2()
        assert(Mv.readsView(df, viewPath),
          df.queryExecution.optimizedPlan.toString)
        assert(!Mv.readsView(df, basePath))
        // bit-exact: Row.toString renders the decimal(22,6) verbatim
        assert(rows(df) == expected)
        // count(qty) must be the NON-null count (qty has nulls at
        // i % 11 == 0), strictly below count(*)
        val r = df.filter($"region" === "r0").head()
        assert(r.getAs[Long]("n_qty") < r.getAs[Long]("n"))
      }
    } finally Mv.deregister(basePath)
  }

  test("global avg (no grouping) rewrites; avg over a non-decimal " +
      "measure bails to the base (r12)") {
    val viewPath = createView()
    try {
      val expected = rows(spark.read.parquet(basePath)
        .agg(avg($"amount".cast("decimal(18,2)")).as("a")))
      withRule {
        val g = spark.read.parquet(basePath)
          .agg(avg($"amount".cast("decimal(18,2)")).as("a"))
        assert(Mv.readsView(g, viewPath),
          g.queryExecution.optimizedPlan.toString)
        assert(rows(g) == expected)
        // qty is a LONG measure: avg(long) → double, order-sensitive
        // float summation — a partial rollup would not be bit-exact,
        // so the rewrite must bail
        val dbl = spark.read.parquet(basePath)
          .groupBy($"region").agg(avg($"qty").as("a"))
        assert(!Mv.readsView(dbl, viewPath))
        assert(Mv.readsView(dbl, basePath))
      }
    } finally Mv.deregister(basePath)
  }

  test("null-bearing measure: sum/min/max partials merge like the base") {
    val viewPath = createView()
    try {
      val direct = rows(spark.read.parquet(basePath)
        .groupBy($"channel").agg(sum($"qty").as("s"), min($"qty").as("mn")))
      withRule {
        val df = spark.read.parquet(basePath)
          .groupBy($"channel").agg(sum($"qty").as("s"), min($"qty").as("mn"))
        assert(Mv.readsView(df, viewPath),
          df.queryExecution.optimizedPlan.toString)
        assert(rows(df) == direct)
      }
    } finally Mv.deregister(basePath)
  }
}
