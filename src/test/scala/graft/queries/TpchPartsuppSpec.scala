package graft.queries

import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The partsupp-centric TPC-H adaptations (q2/q11/q16/q20) run on a
  * partsupp analog derived from lineitem. This spec pins (a) the
  * semantic invariants each query's HAVING/correlated predicate
  * promises, independently of the DuckDB oracle, and (b) the plan
  * shapes that keep them scale-safe (dimension prunes broadcast, the
  * pair-grain rollup partial+final).
  */
class TpchPartsuppSpec extends SparkSpec {

  // sf0.01, not sf0.001: the q2 part filter (size=15 ∧ LARGE) and
  // q11's single-nation supplier set are empty at the smallest SF
  private val sf = "/root/testdata/sf0.01"

  private def result(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll) ++
      p.subqueries.flatMap(collectAll)
  }

  test("q2: every returned supplier carries the true regional min cost") {
    import spark.implicits._
    // recompute the correlated min independently: unit prices of all
    // EUROPE-supplier pairs, min per part, compared to the query rows
    val nat = Tables.nation(spark, sf)
    val reg = Tables.region(spark, sf).filter($"r_name" === "EUROPE")
    val euroSupp = Tables.supplier(spark, sf)
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val trueMin = Tables.lineitem(spark, sf)
      .join(euroSupp, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("true_min"))
    val rows = result("q2_min_cost_supplier")
      .join(trueMin, $"p_partkey" === $"l_partkey")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ps_supplycost") == r.getAs[Double]("true_min"))
    }
  }

  test("q11: returned parts are above the floor, omitted parts below") {
    import spark.implicits._
    val out = result("q11_important_stock").collect()
    assert(out.nonEmpty)
    // the floor is 0.001 * total of ALL per-part values in NATION_7
    val nat = Tables.nation(spark, sf).filter($"n_name" === "NATION_7")
    val supp = Tables.supplier(spark, sf)
      .join(nat, $"s_nationkey" === $"n_nationkey").select($"s_suppkey")
    val total = Tables.lineitem(spark, sf)
      .join(supp, $"l_suppkey" === $"s_suppkey", "left_semi")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    val floor = total * 0.001
    out.foreach(r => assert(r.getAs[Double]("part_value") > floor))
    // and no above-floor part is missing: count both ways
    val nAbove = Tables.lineitem(spark, sf)
      .join(supp, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)"))
        .cast("double").as("pv"))
      .filter($"pv" > floor).count()
    assert(out.length.toLong == nAbove)
  }

  test("q16: flagged suppliers are excluded from every distinct count") {
    import spark.implicits._
    val flagged = Tables.supplier(spark, sf)
      .filter($"s_acctbal" < 0.0)
      .select($"s_suppkey").as[Long].collect().toSet
    // a flagged supplier's pairs must not contribute: recount with the
    // flagged set removed row-wise and compare totals
    val withFlag = Tables.lineitem(spark, sf)
      .filter(!$"l_suppkey".isin(flagged.toSeq: _*))
      .join(Tables.part(spark, sf).filter($"p_brand" =!= "Brand#5" &&
          $"p_type" =!= "PROMO" &&
          $"p_size".isin(1, 4, 9, 16, 25, 36, 49)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("cnt"))
    val expected = withFlag.agg(sum($"cnt")).head().getLong(0)
    val got = result("q16_parts_supplier")
      .agg(sum($"supplier_cnt")).head().getLong(0)
    assert(got == expected)
  }

  test("q20: every returned supplier has a red-part pair past the threshold") {
    import spark.implicits._
    val out = result("q20_excess_shippers").select($"s_name").as[String]
      .collect().toSet
    val li = Tables.lineitem(spark, sf)
    val red = Tables.part(spark, sf).filter($"p_name".startsWith("red"))
      .select($"p_partkey")
    val pairs = li
      .join(red, $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("tot"),
        sum(when($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp"),
          $"l_quantity".cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("q96"))
      .filter($"q96" > lit(0.5) * $"tot")
      .select($"l_suppkey")
    val nat = Tables.nation(spark, sf).filter($"n_name" === "NATION_3")
    val expected = Tables.supplier(spark, sf)
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .join(pairs, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name").as[String].collect().toSet
    assert(out == expected)
  }

  test("plan: q2 dimension prunes broadcast; ps rollup is partial+final") {
    val plan = result("q2_min_cost_supplier").queryExecution.executedPlan
    val all = collectAll(plan)
    assert(all.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      "supplier/region prune and part filter should broadcast")
    // the pair-grain partsupp aggregate must have a partial mode
    // before the exchange (map-side combine on (partkey, suppkey))
    val partials = all.collect {
      case h: HashAggregateExec
          if h.aggregateExpressions.exists(_.mode.toString == "Partial") => h
    }
    assert(partials.nonEmpty, "no partial hash aggregate in the plan")
  }
}
