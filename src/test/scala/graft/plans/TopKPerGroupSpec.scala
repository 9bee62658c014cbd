package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Custom whole-operator top-k-per-group: result identity with the
  * window-rank formulation, physical-plan shape (our exec present, no
  * sort), and bounded-k edge cases.
  */
class TopKPerGroupSpec extends SparkSpec {

  import spark.implicits._

  // bijective score for id < 2_000_000: unique, so ties can't make
  // either formulation nondeterministic
  private def data = spark.range(0, 2000)
    .select(($"id" % 50).as("g"),
      $"id".as("row_id"),
      (($"id" % 1000) * 2000 + $"id" / 1000).cast("double").as("score"))

  test("matches window-rank top-k exactly") {
    val custom = TopKPerGroup.topK(data, Seq("g"), "score", k = 3)
      .select($"g", $"row_id", $"score")
      .orderBy($"g", $"score".desc)
    val w = Window.partitionBy($"g").orderBy($"score".desc)
    val viaWindow = data.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).select($"g", $"row_id", $"score")
      .orderBy($"g", $"score".desc)
    assert(custom.collect().toSeq == viaWindow.collect().toSeq)
  }

  test("physical plan uses the custom exec and no sort") {
    val q = TopKPerGroup.topK(data, Seq("g"), "score", k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500)) // nodeName strips Exec
    assert(!plan.contains("Sort "), "unexpected sort in:\n" + plan.take(800))
  }

  test("NaN scores rank above finite ones, like the window formulation") {
    // NaN arrives AFTER the heap fills — the arrival order that an
    // IEEE `>` eviction test would silently drop
    val data = Seq((1, 10L, 3.0), (1, 11L, 4.0),
      (1, 12L, Double.NaN), (1, 13L, 5.0))
      .toDF("g", "row_id", "score")
    val custom = TopKPerGroup.topK(data, Seq("g"), "score", k = 2)
      .select("row_id").collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc)
    val expected = data.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 2).select("row_id")
      .collect().map(_.getLong(0)).toSet
    assert(expected == Set(12L, 13L)) // Spark sorts NaN largest
    assert(custom == expected)
  }

  test("k >= group size returns whole groups; null scores drop") {
    val small = Seq((1, 10L, Some(5.0)), (1, 11L, Some(7.0)),
      (2, 20L, None), (2, 21L, Some(1.0)))
      .toDF("g", "row_id", "score")
    val out = TopKPerGroup.topK(small, Seq("g"), "score", k = 10)
      .orderBy("row_id").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(10L, 11L, 21L)) // null-score row dropped
  }

  test("registered via GraftExtensions builder path too") {
    assert(new graft.GraftExtensions() != null)
    // live-session registration is idempotent
    TopKPerGroup.ensureRegistered(spark)
    TopKPerGroup.ensureRegistered(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == TopKPerGroupStrategy) == 1)
  }
}
