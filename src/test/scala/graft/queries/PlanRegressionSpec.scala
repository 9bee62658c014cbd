package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

import graft.SparkSpec

/** Physical-plan regressions are silent — the query stays correct and
  * slowly gets 100× slower at scale. This spec pins the load-bearing
  * plan properties of headline queries: predicate pushdown to the
  * scan, broadcast dimension joins, no accidental nested-loop joins,
  * single-pass aggregation shapes.
  */
class PlanRegressionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll) ++
      p.subqueries.flatMap(collectAll)
  }

  private def planString(name: String): String =
    plan(name).toString

  test("cdc_incremental: watermark predicate reaches the parquet scan") {
    val s = planString("cdc_incremental")
    assert(s.contains("PushedFilters") &&
      s.contains("GreaterThan(ts"), s)
  }

  test("q5_nation_revenue: dimensions broadcast, no nested-loop joins") {
    val all = collectAll(plan("q5_nation_revenue"))
    val bhj = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    val bnlj = all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
    assert(bhj >= 2, s"expected broadcast dimension joins, got $bhj")
    assert(bnlj == 0, "nested-loop join crept into the 5-way join")
  }

  test("dedup_jaccard_pairs: bounded range join planned as equi-join, not BNLJ") {
    val all = collectAll(plan("dedup_jaccard_pairs"))
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "the id-window pair join degenerated to a nested loop")
  }

  test("text_tfidf_top: token explosion computed once, consumers share the cache") {
    val all = collectAll(plan("text_tfidf_top"))
    // the exploded tf is persisted: both the df aggregation and the
    // final join must read the InMemoryTableScan, leaving NO Generate
    // in the outer plan tree (it lives only inside the cached subtree)
    val generates = all.count(
      _.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    val cacheReads = all.count(_.isInstanceOf[
      org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(generates == 0, s"tf recomputed outside the cache ($generates)")
    assert(cacheReads >= 2, s"expected both consumers on the cache, got $cacheReads")
  }

  test("dedup_spans: span counts partial-aggregate before the exchange") {
    // the skew guard: a hot boilerplate span must collapse map-side.
    // Window-over-span-key cannot do that; groupBy(span).count() plans
    // a partial HashAggregate under the span exchange — assert it, and
    // that no Window over the span key survives anywhere in the plan.
    val all = collectAll(plan("dedup_spans"))
    val partialOnSpan = all.exists {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        h.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) &&
          h.groupingExpressions.exists(_.toString.contains("span"))
      case _ => false
    }
    assert(partialOnSpan, "no partial HashAggregate on span before the shuffle")
    val windowOnSpan = all.exists {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.exists(_.toString.contains("span"))
      case _ => false
    }
    assert(!windowOnSpan, "window over the span key crept back in")
  }

  test("q1_pricing_summary: scan prunes to needed columns only") {
    val s = planString("q1_pricing_summary")
    assert(s.contains("PushedFilters"), s)
    // the 16-column lineitem scan must not read more than the 7 used
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val nCols = readSchema.split(",").length
    assert(nCols <= 7, s"scan reads $nCols columns: $readSchema")
  }

  test("agg_hll_registers: sketch agg is partial before the exchange") {
    // registers must collapse map-side (the whole point: m rows per
    // partition shuffle, not one row per input row)
    val s = planString("agg_hll_registers")
    assert(s.contains("partial_max"),
      s"no partial register aggregation before the shuffle:\n$s")
    // and the scan reads ONLY the key column
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 1, s"scan reads: $readSchema")
  }

  test("orders_open_by_day: delta aggregation partial before the exchange") {
    val all = collectAll(plan("orders_open_by_day"))
    val aggs = all.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.exists(_.toString.contains("partial_sum")),
      "sweep deltas must map-side combine (calendar-bounded shuffle)")
  }

  test("dedup_allpairs: candidate join is an equi-join, verify after distinct") {
    val all = collectAll(plan("dedup_allpairs"))
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "prefix-token candidate join degenerated to a nested loop")
  }

  test("agg_kmv_bottomk: global order is TakeOrdered, never a full sort") {
    val all = collectAll(plan("agg_kmv_bottomk"))
    assert(all.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "bottom-k must plan as TakeOrderedAndProject (k-bounded heads)")
  }

  test("hybrid_search_rrf: both legs rank via sharded GlobalRank") {
    // r4 verdict: the lexical leg ranked with a partitionless window —
    // corpus-proportional for a common term at 100 TB. Both legs now
    // ride GlobalRank, whose ONLY partitionless window runs over the
    // |shards|-row offsets aggregate. Assert exactly that: every
    // empty-partitionSpec WindowExec in the plan sits above a
    // __shard-grouped aggregation (metadata-sized input), never above
    // raw data.
    val all = collectAll(plan("hybrid_search_rrf"))
    val bare = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(bare.nonEmpty, "expected GlobalRank offset windows in the plan")
    bare.foreach { w =>
      val aggBelow = collectAll(w).exists {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
          h.groupingExpressions.exists(_.toString.contains("__shard"))
        case _ => false
      }
      assert(aggBelow,
        s"partitionless window over non-shard-aggregated input:\n$w")
    }
  }

  test("item_similarity: frequency table broadcasts to both pair sides") {
    val all = collectAll(plan("item_similarity"))
    val bhj = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj >= 2,
      s"the |parts|-row frequency table must broadcast twice, got $bhj")
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "nested-loop join crept into the similarity join")
    // and the top-200 must be a k-bounded heap, not a full global sort
    assert(all.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "limit-after-order must plan as TakeOrderedAndProject")
  }
}
