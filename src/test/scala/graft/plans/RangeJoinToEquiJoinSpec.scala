package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinToEquiJoinSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToEquiJoin
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinToEquiJoin)
  }

  test("bounded range join rewrites to equi-join with identical results") {
    val a = spark.range(0, 2000).select($"id".as("ia"))
    val b = spark.range(0, 2000).select($"id".as("ib"))

    val rangeJoin = a.join(b, $"ib" > $"ia" && $"ib" <= $"ia" + 3)

    // without the rule: nested-loop join
    val planBefore = rangeJoin.queryExecution.executedPlan.toString
    assert(planBefore.contains("BroadcastNestedLoopJoin"), planBefore)

    withRule {
      val rewritten = a.join(b, $"ib" > $"ia" && $"ib" <= $"ia" + 3)
      val planAfter = rewritten.queryExecution.executedPlan.toString
      assert(!planAfter.contains("BroadcastNestedLoopJoin"), planAfter)
      assert(planAfter.contains("Generate explode"), planAfter)

      val got = rewritten.select($"ia", $"ib").as[(Long, Long)]
        .collect().toSet
      val expected = (0L until 2000L).flatMap(i =>
        (i + 1 to math.min(i + 3, 1999L)).map(j => (i, j))).toSet
      assert(got == expected)
    }
  }

  test("rule leaves non-window joins untouched") {
    withRule {
      val a = spark.range(0, 100).select($"id".as("ia"))
      val b = spark.range(0, 100).select($"id".as("ib"))
      // equi-join: unchanged semantics and still a normal join
      val eq = a.join(b, $"ia" === $"ib")
      assert(eq.count() == 100)
      // unbounded range: not rewritten (no K literal) — still correct
      val unb = a.join(b, $"ib" > $"ia")
      assert(unb.count() == 100L * 99L / 2)
    }
  }
}
