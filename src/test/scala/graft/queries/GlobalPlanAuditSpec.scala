package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Engine-wide join-shape audit: build EVERY query's physical plan
  * and flag any CartesianProduct or BroadcastNestedLoopJoin that is
  * not on the explicit allow-list. Each allowed case is a deliberate
  * design (a 1-row scalar broadcast, a tiny-domain cross join, the
  * brute-force ANN baseline, skyline's tiny-side dominance pass) —
  * anything new failing here is a silent plan regression that would
  * be quadratic at scale.
  */
class GlobalPlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // queries whose BNLJ/cartesian is intentional, with the reason
  private val allowed: Set[String] = Set(
    "ann_cosine_topk",     // 5-query broadcast × corpus IS the algorithm
    "ann_topk_agg",        // same brute-force baseline
    "embed_neardup_pairs", // bounded id-window candidates (tiny side)
    "ann_pq_adc",          // per-query LUT broadcast cross
    "ann_ivf_topk",        // centroid-literal probe cross
    "ann_lsh_topk",        // probe-set cross against tiny query side
    "cross_join_grid",     // tiny-domain cross join, zero-filled cells
    "skyline_parts",       // dominance pass over TINY survivor set
    "profile_lineitem",    // 1-row scalar joins
    "text_bm25_topk",      // 1-row corpus-scalar broadcast
    "text_rarity_score",   // 1-row corpus-scalar broadcast
    "text_tfidf_top",      // 1-row N broadcast
    "filter_relative_length", // 1-row percentile threshold broadcast
    "scalar_subquery_avg", // scalar subquery → 1-row join
    "q15_top_supplier",    // scalar-max subquery
    "q17_small_quantity",  // correlated per-part average (decorrelated)
    "q22_sales_opportunity", // scalar threshold broadcast
    "id_gap_detection",    // 1-row bounds broadcast
    "outlier_iqr",         // per-group quartile struct broadcast
    "mix_by_source",       // 1-row totals broadcast
    "pareto_customers",    // 1-row totals broadcast
    "customer_rfm",        // 1-row n_total broadcast (×3 scores)
    "incremental_stats",   // merged-state scalar compare
    "semdedup_kmeans",     // k×dim centroid-table cross
    "semdedup_embed",      // same, firstK flavor
    "curation_pipeline",   // stats scalar broadcast at the tail
    "cdc_counts",          // single-row summary cross
    "cdc_sql_tp_prune",    // two 1-row prune-proof summaries crossed
    "scd2_expire_history", // 1-row history × as-of summaries crossed
    "cdc_minmax_ts",       // single-row summary
    "cdc_table_checksum",  // 3-scalar fold
    "agg_sketches",        // single-row sketch summary
    "events_gapfill",      // 1-row (min,max) spine bounds broadcast
    "graph_pagerank",      // 1-row n_nodes broadcast per superstep
    "quantile_buckets",    // 1-row n_total broadcast for ntile
    "agg_quantile_sample", // 1-row bottom-k estimate broadcast for rank check
    "kmv_set_ops",         // k-row sketch frames × 1-row theta cut
    "q11_important_stock", // 1-row value-floor scalar broadcast
    "sample_dsir_weights", // 1-row normalization scalar broadcast
    "text_bigram_lm",      // 1-row model-total scalar broadcast
    "text_heavy_hitters",  // 1-row corpus-total broadcast
    "hybrid_search_rrf",   // 1-row probe-vector + corpus-stats broadcasts
  )

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes)
  }

  test("no query plans an unexpected cartesian or nested-loop join") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val bad = allNodes(plan).exists {
        case _: CartesianProductExec => true
        case _: BroadcastNestedLoopJoinExec => true
        case _ => false
      }
      if (bad && !allowed.contains(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian in: ${offenders.mkString(", ")}")
  }
}
