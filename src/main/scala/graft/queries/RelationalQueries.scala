package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational engine surface over the TPC-H-ish testdata: aggregation,
  * joins of every shape, windows, set ops, rollup, string/date functions.
  * These are the headline bench queries; each has a DuckDB oracle.
  *
  * Numeric determinism: money columns are stored as DOUBLE with 2-decimal
  * values. Double SUM is reassociation-sensitive (Spark's partial aggs vs
  * DuckDB's sequential scan), so every SUM first casts to DECIMAL — exact,
  * associative — and the final result casts back to DOUBLE, which is
  * bit-identical in both engines. AVG = decimal SUM / COUNT in double.
  *
  * Scale notes (100 TB design):
  *  - dimension joins (region/nation/supplier/part/customer) are
  *    explicitly `broadcast()` — no shuffle of the fact table;
  *  - fact-fact joins (orders⨝lineitem) shuffle on the join key once,
  *    with AQE free to pick SMJ vs shuffled-hash at runtime;
  *  - all aggregates are partial+final (map-side combine) by
  *    construction since they're plain `groupBy().agg()`.
  */
object RelationalQueries {

  /** Giant-basket guard for the market-basket pair explode: a basket
    * of n items emits n·(n−1)/2 pairs from ONE row, so an uncapped
    * degenerate basket (bot traffic, a catalog-wide order) bursts
    * quadratically inside a single task. 512 is far above any real
    * basket (TPC-H orders hold ≤ 7 lines) while capping the per-row
    * burst at ~131k pairs. Shared by basket_pairs / item_similarity
    * and mirrored in their oracle SQL.
    */
  private[queries] val MaxBasket = 512

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal sum rendered as double (bit-identical across engines). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy grouped aggregation with derived exprs
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 shape: 3-way join, filter on dimension, grouped revenue, top-k
    "q3_top_orders" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 5-way join through the dimension chain
    "q5_nation_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val supp = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // broadcast dimension join + grouped count
    "join_broadcast_part" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // anti join: customers with no recent orders (NOT EXISTS)
    "join_anti_customers" -> ((s, dir) => {
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      Tables.customer(s, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // full outer join: daily order volume vs daily ship volume — days
    // that appear on only one side survive with the other count null.
    // Both sides pre-aggregate before the join (map-side combine), so
    // the shuffle carries one row per day, not one per order/lineitem.
    "join_full_outer" -> ((s, dir) => {
      val od = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val sd = Tables.lineitem(s, dir)
        .groupBy(col("l_shipdate").as("day"))
        .agg(count(lit(1)).as("n_ships"))
      od.join(sd, Seq("day"), "full_outer")
        .orderBy(col("day"))
    }),

    // top-3 orders per customer through the CUSTOM physical operator
    // (graft.plans.TopKPerGroup: LogicalPlan + Strategy + SparkPlan,
    // k-bounded heap instead of a per-group sort — no Sort in the
    // plan). Score salts the orderkey into sub-cent bits so it is
    // unique: the heap's tie behavior never decides the result, which
    // is what lets a window-rank oracle hash-match it exactly.
    "topk_per_group" -> ((s, dir) => {
      val scored = Tables.orders(s, dir)
        .filter(col("o_custkey") < 200)
        .withColumn("score",
          col("o_totalprice") + col("o_orderkey").cast("double") * 1e-9)
      graft.plans.TopKPerGroup.topK(scored, Seq("o_custkey"), "score", k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("score"))
        .orderBy(col("o_custkey"), col("score").desc)
    }),

    // dense reporting grid: every (orderstatus × orderpriority) cell,
    // zero-filled where no orders exist — an intentional CROSS JOIN of
    // two tiny distinct domains (broadcast NL join over dozens of
    // rows), then a left join of the real counts onto the grid.
    "cross_join_grid" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val statuses = ord.select(col("o_orderstatus").as("status")).distinct()
      val prios = ord.select(col("o_orderpriority").as("priority")).distinct()
      val counts = ord.groupBy(
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
      statuses.crossJoin(prios)
        .join(counts, Seq("status", "priority"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .orderBy(col("status"), col("priority"))
    }),

    // window: running revenue per customer over order dates
    "window_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_spend",
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // window: top-3 orders per customer by totalprice (rank + filter)
    "window_top3_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // window frame functions: lead-with-default, first/last/nth value
    // over the full partition frame, quartile ntile — one shuffle on
    // the partition key, deterministic via the unique orderkey
    "window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 50)
        .withColumn("next_price", lead(col("o_totalprice"), 1, 0.0).over(w))
        .withColumn("first_price", first(col("o_totalprice")).over(full))
        .withColumn("last_price", last(col("o_totalprice")).over(full))
        .withColumn("second_price",
          nth_value(col("o_totalprice"), 2).over(full))
        .withColumn("quartile", ntile(4).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("next_price"),
          col("first_price"), col("last_price"), col("second_price"),
          col("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // exact interpolated percentiles: both engines interpolate on the
    // sorted values, and quartile fractions are exact binary so results
    // hash-match. Scale note: exact percentile gathers every value of a
    // group at the final aggregate — it is the CORRECTNESS fixture; the
    // production path at 100 TB is the mergeable sketch (agg_sketches,
    // percentile_approx), which this query cross-checks
    "agg_percentiles_exact" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
    }),

    // explicit GROUPING SETS with grouping() markers (finer than the
    // rollup/cube pair): per-status, per-priority, and grand total in
    // one pass over the fact
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          count(*) AS n,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority,
          o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }),

    // correlated LATERAL subquery (top-2 orders per customer): Catalyst
    // decorrelates the per-row dependent subquery into a join + window
    "lateral_top2_orders" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_lat")
      Tables.customer(s, dir).createOrReplaceTempView("customer_lat")
      s.sql("""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey < 100
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    }),

    // correlated EXISTS with an inequality predicate — decorrelated
    // into a semi-join on the fly
    "exists_correlated" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_ex")
      Tables.customer(s, dir).createOrReplaceTempView("customer_ex")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey""")
    }),

    // bag-semantics set ops: EXCEPT ALL keeps multiplicity (a customer
    // nation appearing 5x with 2 supplier matches survives 3x)
    "set_ops_all" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("int").as("nkey"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_nationkey").cast("int").as("nkey"))
      cust.exceptAll(supp)
        .groupBy(col("nkey"))
        .agg(count(lit(1)).as("n_surviving"))
        .orderBy(col("nkey"))
    }),

    // one-pass table profile: the data-quality summary a pipeline runs
    // before training — row/null/distinct counts and value ranges in a
    // single aggregation over the fact table
    "profile_lineitem" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L))
          .as("null_flags"),
        countDistinct(col("l_partkey")).as("distinct_parts"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    }),

    // IQR (boxplot-rule) outlier detection per group: bounds from exact
    // quartiles — integer-valued quantities keep the interpolation
    // arithmetic exact in both engines, so the flag counts hash-match
    "outlier_iqr" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val q = li.groupBy(col("l_returnflag")).agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
        .withColumn("lo", col("p25") - (col("p75") - col("p25")) * 1.5)
        .withColumn("hi", col("p75") + (col("p75") - col("p25")) * 1.5)
      li.join(broadcast(q), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(first(col("n")).as("n"),
          first(col("p25")).as("p25"), first(col("p75")).as("p75"),
          sum(when(col("l_quantity") < col("lo") ||
            col("l_quantity") > col("hi"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("l_returnflag"))
    }),

    // per-session stats from the reusable sessionizer: event counts and
    // wall-clock durations per (user, session) — the user-journey
    // segmentation downstream of raw sessionization
    "events_session_stats" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .filter(col("user_id") < 50)
      graft.operators.Sessionize
        .assign(ev, "user_id", "ts_sec", "event_id", gapSec = 1800L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // distinct aggregation
    "agg_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // set ops: union / intersect / except over key domains
    "set_ops_keys" -> ((s, dir) => {
      val custNations = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("int").as("nkey")).distinct()
      val suppNations = Tables.supplier(s, dir)
        .select(col("s_nationkey").cast("int").as("nkey")).distinct()
      val both = custNations.intersect(suppNations)
        .withColumn("src", lit("both"))
      val custOnly = custNations.except(suppNations)
        .withColumn("src", lit("cust_only"))
      both.union(custOnly).orderBy(col("nkey"), col("src"))
    }),

    // rollup: hierarchical aggregate with subtotals
    "rollup_flag_status" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy(col("flag"), col("status"))
    }),

    // CASE bucketing + conditional (pivot-style) aggregation
    "agg_pivot_priority" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_orderpriority").startsWith("1"), 1)).as("n_urgent"),
          count(when(col("o_orderpriority").startsWith("2"), 1)).as("n_high"),
          count(when(!col("o_orderpriority").startsWith("1") &&
            !col("o_orderpriority").startsWith("2"), 1)).as("n_rest"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // string functions: upper / substr / length / concat / regexp_replace
    "string_funcs" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 12).as("name12"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"))
        .orderBy(col("p_partkey"))
    }),

    // rank statistics: rank / dense_rank / percent_rank / cume_dist —
    // all tie-stable (equal inputs get equal outputs), so the result
    // is deterministic even over tied prices; the doubles derive from
    // integer ranks, hence exact cross-engine.
    "window_rank_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prank", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    }),

    // argmax/argmin aggregates: the value of one column at another's
    // extremum per group — single hash-agg, no self-join or window.
    "agg_minmax_by" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
            .as("priciest_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
            .as("cheapest_order"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // unpivot (melt): wide per-status aggregate -> long (status,
    // metric, value) rows — the inverse of pivot, narrow per-row
    // generate after one aggregation shuffle.
    "unpivot_metrics" -> ((s, dir) => {
      val wide = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"),
          count(lit(1)).cast("double").as("n_orders"),
          countDistinct(col("o_custkey")).cast("double").as("n_customers"))
      wide.unpivot(
        Array(col("o_orderstatus")),
        Array(col("total_price"), col("n_orders"), col("n_customers")),
        "metric", "value")
        .orderBy(col("o_orderstatus"), col("metric"))
    }),

    // sequence-gap detection: which ids are missing from a dense key
    // space — expected range anti-joined against actuals. The bounds
    // are two scalars (legitimately driver-sized, like the IVF
    // centroid table); spark.range then generates the expected keys
    // DISTRIBUTED across tasks — an explode(sequence(lo, hi)) would
    // build the whole range as one row's array in one task.
    "id_gap_detection" -> ((s, dir) => {
      // the synthetic keyspace is dense, so drop every 97th key to
      // give the detector real gaps to find
      val all = Tables.orders(s, dir).select(col("o_orderkey"))
      val ord = all.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      // bounds from the UNFILTERED key space: the dropped keys are the
      // gaps we're hunting, so they must stay inside the range
      val Array(b) = all.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()
      val expected = s.range(b.getLong(0), b.getLong(1) + 1)
        .select(col("id").as("expected_key"))
      expected.join(ord, expected("expected_key") === ord("o_orderkey"),
        "left_anti")
        .orderBy(col("expected_key"))
        .limit(100)
    }),

    // boolean aggregates: universally/existentially quantified
    // predicates per group (bool_and/bool_or) — the assertion-style
    // aggregate a data-quality gate runs per partition key.
    "agg_boolean" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "F").as("any_final"),
          bool_and(col("o_custkey").isNotNull).as("keys_complete"))
        .orderBy(col("o_orderpriority"))
    }),

    // null semantics: inject nulls, then exercise null-safe equality
    // (<=>), NULLIF, two-valued coalesce chains, and null-aware
    // grouped counts — the ANSI-null corner cases an engine must get
    // right before any three-valued filter logic can be trusted.
    "null_semantics" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_custkey") < 100)
        .withColumn("clerk_n",
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        .withColumn("prio_n", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
      ord.groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("clerk_n")).as("n_clerk"), // COUNT skips nulls
          sum(when(col("clerk_n") <=> lit(null).cast("string"), 1L)
            .otherwise(0L)).as("n_null_safe"),
          sum(when(col("prio_n").isNull, 1L).otherwise(0L)).as("n_medium"),
          min(coalesce(col("prio_n"), lit("(none)"))).as("min_prio"))
        .orderBy(col("o_custkey"))
    }),

    // string shaping: pad / trim / translate / repeat / reverse —
    // narrow per-row, the formatting layer of any export surface
    "string_shaping" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          rpad(col("p_type").substr(1, 6), 10, ".").as("type_pad"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_caps_vowels"),
          trim(lit(" x "), lit(" ")).as("trimmed"),
          reverse(col("p_brand")).as("brand_rev"),
          repeat(lit("-"), 5).as("rule"))
        .orderBy(col("p_partkey"))
    }),

    // date arithmetic: day diffs, offsets, month boundaries — the
    // retention/cohort math layer
    "date_arith" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 30)
        .select(col("o_orderkey"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")),
            col("o_orderdate").cast("date")).as("days_to_eoy"),
          date_format(date_add(col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").as("due_date"),
          date_format(last_day(col("o_orderdate").cast("date")),
            "yyyy-MM-dd").as("month_end"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .orderBy(col("o_orderkey"))
    }),

    // date parts: extraction + truncation + grouped counts
    "date_parts" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("y"), col("m"))
    }),

    // correlated-scalar shape: orders above their customer's average
    // (decorrelated to a join in both engines)
    "scalar_subquery_avg" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val custAvg = ord.groupBy(col("o_custkey").as("ck"))
        .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
      ord.join(custAvg, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy(col("o_orderstatus"))
    }),

    // cube: all grouping-set combinations with subtotals
    "cube_flag_status" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy(col("flag"), col("status"))
    }),

    // snapshot ⊎ changelog reconciliation: latest state per key from a
    // unioned snapshot + change stream (the CDC compaction shape)
    "cdc_compaction" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val snapshot = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit(0L).as("version"))
      val changes = ord.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          (dec(col("o_totalprice")) * lit(2).cast("decimal(18,2)"))
            .cast("double").as("o_totalprice"),
          lit(1L).as("version"))
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("version").desc)
      snapshot.union(changes)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy()
        .agg(count(lit(1)).as("n_keys"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // sessionization: gap>30min starts a new session (lag + cumulative sum)
    "events_sessionize" -> ((s, dir) => {
      // per-user session counts via the reusable sessionizer:
      // n_sessions = the highest session index assigned
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
      graft.operators.Sessionize
        .assign(ev, "user_id", "ts_sec", "event_id", gapSec = 1800L)
        .groupBy(col("user_id"))
        .agg(max(col("session_idx")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // cohort retention: customers bucketed by first-order month, then
    // distinct active customers per (cohort, month offset) — two
    // keyed aggregations and one fact-fact join on the customer key
    "cohort_retention" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).as("m"))
      val first = ord.groupBy(col("o_custkey"))
        .agg(min(col("m")).as("cohort"))
      ord.join(first, Seq("o_custkey"))
        .groupBy(date_format(col("cohort"), "yyyy-MM").as("cohort_month"),
          months_between(col("m"), col("cohort")).cast("int")
            .as("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy(col("cohort_month"), col("month_offset"))
    }),

    // conversion funnel: users reaching view → click-after-view →
    // purchase-after-click, each stage's entry time = the EARLIEST
    // qualifying event after the previous stage (classic ordered-funnel
    // semantics, not mere event presence). Three keyed aggregations and
    // two joins, all hash-partitioned on user_id — at 100 TB every stage
    // reuses one user_id partitioning and the per-stage tables shrink
    // monotonically, so no stage shuffles more than the first.
    "events_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      def stage(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage(t1, "1_view")
        .unionAll(stage(t2, "2_click_after_view"))
        .unionAll(stage(t3, "3_purchase_after_click"))
        .orderBy(col("stage"))
    }),

    // event-type transition matrix (first-order Markov counts): the
    // previous event per user via lag, then a global (prev, curr)
    // count — one user-keyed window shuffle feeding one small
    // aggregation; the matrix is |types|² rows regardless of data size
    "events_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
        .withColumn("prev_type",
          coalesce(lag(col("event_type"), 1).over(w), lit("START")))
        .groupBy(col("prev_type"), col("event_type").as("curr_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("curr_type"))
    }),

    // equi-depth decile histogram WITHOUT the global-window trap: a
    // bare ntile(10) OVER (ORDER BY ...) funnels every row through one
    // task's sort, so the bucket index is instead computed from a
    // DISTRIBUTED global rank (graft.operators.GlobalRank): range-band
    // shards from approx-percentile boundaries (balance only — never
    // correctness), parallel per-shard ranks, per-shard counts chained
    // into offsets, then the exact SQL ntile formula applied to
    // rank+total. The oracle is DuckDB's native ntile(10) — the
    // distributed formula must reproduce the engine builtin row-exactly.
    "quantile_buckets" -> ((s, dir) => {
      import graft.operators.GlobalRank
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      val bs = ord.agg(percentile_approx(col("o_totalprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("b"))
        .first().getSeq[Double](0)
      val ranked = GlobalRank.withGlobalRank(ord,
        Seq(col("o_totalprice"), col("o_orderkey")),
        GlobalRank.rangeShard(col("o_totalprice"), bs), "rnk")
      val tot = ord.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("bucket",
          GlobalRank.ntileOf(col("rnk"), col("n_total"), 10))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .orderBy(col("bucket"))
    }),

    // rolling z-score anomaly flags: each event scored against the
    // mean/stddev of its user's previous 10 values — sums accumulate
    // exactly in DECIMAL over the window frame, and mean/σ/z run in
    // double through the same IEEE tree the oracle spells out. One
    // user-keyed window shuffle; frame state is 10 rows per partition
    // cursor regardless of scale.
    "events_anomaly_zscore" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = (c: Column) => c.cast("double")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-10, -1)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("v"))
        .withColumn("n_prev", count(col("v")).over(w))
        .withColumn("sx", sum(col("v")).over(w))
        .withColumn("sxx",
          sum((col("v") * col("v")).cast("decimal(38,4)")).over(w))
        .filter(col("n_prev") >= 5)
        .withColumn("mu", d(col("sx")) / d(col("n_prev")))
        .withColumn("sg", sqrt(
          (d(col("sxx")) - d(col("sx")) * col("mu")) /
            d(col("n_prev") - 1)))
        .withColumn("z", (d(col("v")) - col("mu")) / col("sg"))
        .filter(col("sg") > 0 && abs(col("z")) >= 2.5)
        .select(col("user_id"), col("event_id"), col("n_prev"),
          floor(col("z") * lit(1000000.0)).cast("bigint").as("z_ppm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // time-RANGE window frame (vs the ROWS frames of window_frames):
    // trailing 1-hour sums per user — the frame is defined by the
    // ORDER-BY VALUE (epoch seconds), so peers at the same timestamp
    // all join the frame regardless of row order, and sparse/bursty
    // series get correct time semantics where a ROWS frame would not.
    // Epoch seconds as BIGINT + DECIMAL sums keep both engines exact.
    // Same scale shape as any keyed window: one shuffle on user_id.
    "window_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es")).rangeBetween(-3599L, 0L)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          // NTZ has no direct long cast; via LTZ in the UTC session the
          // epoch-second value equals the oracle's epoch over naive ts
          col("ts").cast("timestamp_ltz").cast("long").as("es"),
          col("value").cast("decimal(18,2)").as("v"))
        .withColumn("n_in_hour", count(col("v")).over(w))
        .withColumn("sum_in_hour",
          sum(col("v")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("es"),
          col("n_in_hour"), col("sum_in_hour"))
        .orderBy(col("user_id"), col("es"), col("event_id"))
    }),

    // join-key skew diagnostics: the distribution of per-key row counts
    // for the two hottest join keys in the schema — the numbers that
    // decide salting factors and AQE skew thresholds BEFORE a 100 TB
    // join is planned. One map-side-combined groupBy per key column,
    // then order-free aggregates over the |keys|-row count tables;
    // exact p50/p99 ride the percentile corridor, and the max/mean
    // skew ratio is the only float (identical tree, ppm-floored).
    "profile_skew" -> ((s, dir) => {
      val d = (c: Column) => c.cast("double")
      def dist(df: DataFrame, keyCol: String, label: String): DataFrame = {
        val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
        counts.agg(
          lit(label).as("key_col"),
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"),
          percentile(col("cnt"), lit(0.5)).as("p50"),
          percentile(col("cnt"), lit(0.99)).as("p99"),
          max(col("cnt")).as("max_cnt"),
          floor(d(max(col("cnt"))) * d(count(lit(1)))
            / d(sum(col("cnt"))) * lit(1000000.0))
            .cast("bigint").as("skew_ppm"))
      }
      dist(Tables.events(s, dir), "user_id", "events.user_id")
        .unionByName(dist(Tables.lineitem(s, dir), "l_orderkey",
          "lineitem.l_orderkey"))
        .orderBy(col("key_col"))
    }),

    // seasonality probe: autocorrelation of the hourly event volume at
    // lag 1 h and lag 24 h. The hourly series is |hours| rows (grows
    // with calendar time, not data volume — broadcastable at any SF),
    // lagged pairs come from an integer hour-index equi-join, and all
    // five moments are BIGINT sums, so only the final Pearson formula
    // runs in doubles — the same identical-IEEE-tree corridor as
    // stats_correlation. A daily usage cycle shows up as r(24h) >>
    // r(1h)'s decay.
    "events_autocorr" -> ((s, dir) => {
      val d = (c: Column) => c.cast("double")
      // persist the |hours|-row series: its four references below would
      // otherwise each re-scan the events table — at scale that is four
      // full passes to rebuild a table that fits in one executor page
      val hourly = Tables.events(s, dir)
        .select(expr("cast(date_trunc('hour', ts) as long) div 3600L")
          .as("he"))
        .groupBy(col("he")).agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lagged = Seq(1L, 24L).map { l =>
        hourly.select(col("he"), col("n").as("x"))
          .join(hourly.select((col("he") - l).as("he"), col("n").as("y")),
            Seq("he"))
          .select(lit(l).as("lag_h"), col("x"), col("y"))
      }.reduce(_ unionByName _)
      val agg = lagged.groupBy(col("lag_h")).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val num = d(col("n_pairs")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
      val den = sqrt(d(col("n_pairs")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(d(col("n_pairs")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      agg.select(col("lag_h"), col("n_pairs"),
          floor((num / den) * lit(1000000.0)).cast("bigint").as("r_ppm"))
        .orderBy(col("lag_h"))
    }),

    // inter-arrival time profile: per-user consecutive gaps (lag over
    // the µs-integer event order — key-parallel, one shuffle), then
    // one global aggregate over the BIGINT second gaps. Exact
    // percentiles ride the agg_percentiles_exact corridor (identical
    // linear interpolation on integer inputs in both engines); the
    // µs→s floor runs per gap, before any aggregation. The arrival-
    // rate / burstiness profile every event pipeline wants, with no
    // partitionless window anywhere.
    "events_interarrival" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          // ts arrives TIMESTAMP_NTZ from µs-parquet; NTZ→LTZ under the
          // UTC session reads the wall clock as UTC, matching the
          // oracle's epoch_us over the naive value (unix_micros itself
          // rejects NTZ input)
          unix_micros(col("ts").cast("timestamp_ltz")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(expr("(us - prev_us) div 1000000L").as("gap_s"))
        .agg(count(lit(1)).as("n_gaps"),
          percentile(col("gap_s"), lit(0.5)).as("p50_s"),
          percentile(col("gap_s"), lit(0.9)).as("p90_s"),
          max(col("gap_s")).as("max_s"),
          sum(when(col("gap_s") > 3600, 1L).otherwise(0L))
            .as("n_over_hour"))
    }),

    // exponentially-weighted moving average per user, computed as a
    // per-key ordered integer fold: value → exact cents via
    // DECIMAL(18,2), then EWMA_t = (cents_t + EWMA_{t-1}) div 2 —
    // α = 1/2 in pure BIGINT, so the sequential recurrence is
    // bit-exact and both engines replay it identically (a float EWMA
    // could not be oracled). Key-parallel, one shuffle: EWMA is
    // inherently sequential per series, so the scalable shape is
    // "parallel across keys, fold within key" — collect_list state is
    // bounded by events-per-key (chunk very long series by time range
    // and chain the folds if a single key outgrows memory).
    "events_ewma" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_sort(collect_list(struct(col("event_id"), col("cents"))))
            .as("seq"))
        .withColumn("ewma_cents",
          expr("aggregate(transform(seq, x -> x.cents), 0L, " +
            "(acc, x) -> (acc + x) div 2)"))
        .select(col("user_id"), col("n_events"), col("ewma_cents"))
        .orderBy(col("user_id"))
    }),

    // customer-revenue Pareto curve (who makes up the top of the book):
    // per-customer spend, ranked DESC with a DISTRIBUTED running total
    // (GlobalRank.withRunningTotal — per-shard cumsums + per-shard sum
    // offsets; no partitionless window), cut into spend deciles with
    // the exact ntile formula, each reporting its cumulative share of
    // total revenue in basis points. Running totals accumulate in
    // DECIMAL (associative across the shard recombination); only the
    // final share division runs in double, mirrored in the oracle.
    "pareto_customers" -> ((s, dir) => {
      import graft.operators.GlobalRank
      val d = (c: Column) => c.cast("double")
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      val bs = spend.agg(percentile_approx(d(col("spend")) * lit(-1.0),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("b"))
        .first().getSeq[Double](0)
      val ranked = GlobalRank.withRunningTotal(spend,
        Seq(col("spend").desc, col("o_custkey")),
        GlobalRank.rangeShard(d(col("spend")) * lit(-1.0), bs),
        col("spend"), "rnk", "cum_spend")
      val tot = spend.agg(sum(col("spend")).as("tot"),
        count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("decile",
          GlobalRank.ntileOf(col("rnk"), col("n_total"), 10))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).cast("double").as("decile_spend"),
          floor((d(max(col("cum_spend"))) * lit(10000.0)) /
            d(max(col("tot")))).cast("bigint").as("cum_share_bp"))
        .orderBy(col("decile"))
    }),

    // market-basket co-occurrence: part pairs bought together within
    // an order. The self-join fans out O(n·k) where k is basket size
    // (bounded by order shape, not data volume), pairs map-side-combine
    // in the count, and a support floor keeps the tail out of the
    // result. Deterministic top-200 by (support desc, pair).
    "basket_pairs" -> ((s, dir) => {
      // basket-local pair generation instead of an items⋈items
      // self-join: one shuffle to assemble each order's distinct part
      // set, then the a<b pairs explode LOCALLY from the sorted array
      // (baskets are small — bounded items per order — so the
      // quadratic step is per-row constant work, while the self-join
      // form shuffled the items table twice and joined). Pair counts
      // are a partial-aggregated groupBy. Baskets above MaxBasket are
      // dropped BEFORE the explode (r4 verdict item): one pathological
      // degenerate basket would otherwise emit a quadratic row burst
      // — 10k items = 50M pairs from one row — and co-occurrence
      // support from such a basket is noise, the standard
      // market-basket cap. Mirrored in the oracle SQL.
      val baskets = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")) <= MaxBasket)
      baskets.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                 y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("pr"))
        .groupBy(col("pr.part_a").as("part_a"),
          col("pr.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(200)
    }),

    // item-item cosine similarity from co-occurrence counts (the
    // classic recommender primitive): sim(a,b) = n_ab/√(n_a·n_b),
    // reported as sim²·1e8 in PURE BIGINT (n_ab²·1e8 div n_a·n_b) —
    // monotone in sim for non-negative counts, so ranking is exact and
    // no float ever enters the oracle corridor. Same basket-local pair
    // explosion as basket_pairs (one shuffle); the per-item frequency
    // table is |parts|-sized and broadcasts to both sides of the pair.
    "item_similarity" -> ((s, dir) => {
      val items = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val freq = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      val pairs = items.groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        // same giant-basket cap as basket_pairs (see comment there)
        .filter(size(col("ps")) <= MaxBasket)
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                 y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("pr"))
        .groupBy(col("pr.part_a").as("part_a"),
          col("pr.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
      pairs
        .join(broadcast(freq.select(col("l_partkey").as("part_a"),
          col("n").as("n_a"))), Seq("part_a"))
        .join(broadcast(freq.select(col("l_partkey").as("part_b"),
          col("n").as("n_b"))), Seq("part_b"))
        .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          expr("n_ab * n_ab * 100000000L div (n_a * n_b)").as("sim2_e8"))
        .orderBy(col("sim2_e8").desc, col("part_a"), col("part_b"))
        .limit(200)
    }),

    // Pearson correlation / dispersion per group from ALGEBRAIC exact
    // sums: Σx Σy Σxy Σx² Σy² accumulate in DECIMAL (associative,
    // partitioning-free), and only the final corr formula runs in
    // double — the same IEEE expression tree the oracle spells out, so
    // the result is bit-identical instead of drifting with whatever
    // merge order a builtin corr()'s co-moment accumulator saw. At
    // 100 TB this is one map-side-combined aggregate, and the same five
    // sums serve corr, covariance, and stddev without a second pass.
    "stats_correlation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      val d = (c: Column) => c.cast("double")
      val agg = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,4)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,4)")).as("syy"))
      agg.select(col("l_returnflag"), col("n"),
          d(col("sx")).as("sum_x"), d(col("sy")).as("sum_y"),
          floor((
            (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
             sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))
          ) * lit(1000000.0)).cast("bigint").as("corr_ppm"))
        .orderBy(col("l_returnflag"))
    }),

    // salted skew join (graft.operators.SkewJoin): the per-user profile
    // table joins back to the raw events with the key salted 8 ways —
    // the hot-key-safe plan shape for a fact⋈dim join whose dim is too
    // big to broadcast and whose key distribution is skewed. The oracle
    // is the PLAIN join: salting must be invisible in the result.
    // Decimal sums keep the aggregate associative (order-free) so the
    // salted partitioning cannot perturb the hash.
    "join_skew_salted" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,2)").as("v"))
      val dim = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_user_events"))
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("v") * col("n_user_events")).cast("double")
            .as("weighted_value"))
        .orderBy(col("event_type"))
    }),

    // interval sweep-line: open orders per day (an order is open from
    // o_orderdate until its last line ships) WITHOUT exploding one row
    // per order×day — two ±1 deltas per order into a map-side-combined
    // groupBy(day), then a year-sharded distributed running total.
    // The oracle counts containment per change day directly, proving
    // the prefix-sum identity Σ deltas(<=d) = |{i : s_i <= d <= e_i}|.
    "orders_open_by_day" -> ((s, dir) => {
      val lastShip = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      // ~20% of synthetic orders have last_ship < orderdate; clamp so
      // every interval is open at least its order day ([s, e] with
      // e < s would sweep a NEGATIVE delta window [e+1, s-1])
      val spans = Tables.orders(s, dir)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .select(to_date(col("o_orderdate")).as("start_day"),
          greatest(to_date(col("last_ship")), to_date(col("o_orderdate")))
            .as("end_day"))
      graft.operators.IntervalSweep
        .openCounts(spans, "start_day", "end_day", d => year(d))
        .select(col("day").cast("timestamp").as("day"), col("n_open"))
        .orderBy(col("day"))
    }),

    // deterministic-hash HLL registers (operators.DetSketch): the
    // sketch CONTENTS are oracle-exact — every register is an integer
    // DuckDB re-derives from the identical md5 fold — which upgrades
    // the sketch family from rows-only to hash-checked; estimate
    // error bounds live in DetSketchSpec. Shuffle = 64 rows.
    "agg_hll_registers" -> ((s, dir) => {
      graft.operators.DetSketch.hllRegisters(
          Tables.lineitem(s, dir).select(col("l_orderkey")),
          "l_orderkey", p = 6)
        .orderBy(col("bucket"))
    }),

    // Count-Min counters, same idea: 4x64 integer cells any engine
    // replays; point-estimate bounds in DetSketchSpec. Shuffle = 256
    // rows regardless of input size.
    "agg_cms_counters" -> ((s, dir) => {
      graft.operators.DetSketch.cmsCounters(
          Tables.lineitem(s, dir).select(col("l_partkey")),
          "l_partkey", depth = 4, width = 64)
        .orderBy(col("d"), col("w"))
    }),

    // order-priority mix by month: counts plus integer-bp share of
    // the month — the per-month total comes from a window PARTITIONED
    // BY month (keyed, map-side-combinable input), never a global one
    "orders_priority_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
      m.withColumn("month_total",
          sum(col("n")).over(Window.partitionBy(col("month"))))
        .withColumn("share_bp", expr("(10000 * n) div month_total"))
        .select(col("month"), col("priority"), col("n"), col("share_bp"))
        .orderBy(col("month"), col("priority"))
    }),

    // per-hour unique actives + event volume: the tumbling-window
    // exact-distinct companion to events_dau_wau's trailing windows —
    // distinct collapses map-side per (hour, user) before the count
    "events_hourly_uniques" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
        .groupBy(col("hour"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("hour"))
    }),

    // clamped running balance: the sequential recurrence
    // S_i = max(0, S_{i-1} + d_i) looks unparallelizable, but has the
    // closed form S_n = P_n - min(0, min_{j<=n} P_j) (P = plain prefix
    // sum): whenever the min-prefix is negative the clamp has absorbed
    // exactly that much deficit. Two ordinary per-key running windows
    // replace the fold — key-parallel, associative BIGINT cents. The
    // oracle replays the RECURRENCE with list_reduce, so a green row
    // proves the closed form, not just the window arithmetic.
    "events_clamped_balance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          (expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            - lit(5000L)).as("delta"))
        .withColumn("p", sum(col("delta")).over(w))
        .withColumn("m", min(col("p")).over(w))
        .select(col("user_id"), col("event_id"),
          (col("p") - least(lit(0L), col("m"))).as("balance_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other — the join semantics ordinary `=` silently
    // drops. Derived nullable keys on both sides; hash-joinable in
    // both engines (null-safe equality is still an equi-join key).
    "join_null_safe" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.groupBy(nullif(col("event_type"), lit("error")).as("k"))
        .agg(count(lit(1)).as("n_a"))
      val b = ev.filter(col("value") > 50)
        .groupBy(nullif(col("event_type"), lit("error")).as("k"))
        .agg(count(lit(1)).as("n_b"))
      a.join(b, a("k") <=> b("k"), "left")
        .select(a("k").as("k"), col("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // declarative data-quality validation (operators.Validate): all
    // row-local checks fold into ONE conditional-sum scan; uniqueness
    // is a map-side-combined groupBy; the FK check is a left_anti
    // against deduplicated dimension keys. Report = |checks| rows.
    // A planted violation (quantity range tightened to exclude real
    // rows) keeps the non-zero path honest.
    "validate_lineitem" -> ((s, dir) => {
      import graft.operators.Validate._
      report(Tables.lineitem(s, dir), Seq(
        notNull("l_shipdate"),
        inRange("l_quantity", 1, 49),
        acceptedValues("l_returnflag", Seq("A", "N", "R")),
        inRange("l_discount", 0.0, 0.1),
        Unique("unique(order,line)", Seq("l_orderkey", "l_linenumber")),
        ForeignKey("fk(l_orderkey)", "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")))
    }),

    // frequent 3-step event paths: sessionize, take consecutive
    // event-type triples per session (two leads over the session-local
    // order — the partition key is (user, session), so no global
    // window), count and rank. The clickstream "top paths" report.
    "events_top_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
      val sess = graft.operators.Sessionize
        .assign(ev, "user_id", "ts_sec", "event_id", gapSec = 1800L)
      val w = Window.partitionBy(col("user_id"), col("session_idx"))
        .orderBy(col("ts_sec"), col("event_id"))
      sess
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),

    // DAU / trailing-7-day WAU / stickiness: the exact trailing
    // distinct count WITHOUT a distinct-over-range window (which
    // cannot partial-aggregate): each (user, day) activity explodes
    // to its <=7 cover days — a bounded ×7 map-side expansion — then
    // one distinct + one count per day. Stickiness in integer bp.
    "events_dau_wau" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day").cast("timestamp").as("day"), col("dau"),
          col("wau"), expr("(10000 * dau) div wau").as("stickiness_bp"))
        .orderBy(col("day"))
    }),

    // RFM segmentation: per-customer recency/frequency/monetary
    // quintiles — three GlobalRank passes (range-band shards from
    // sampled percentiles; balance affects parallelism, never the
    // exact rank) + the exact SQL ntile formula, so DuckDB's native
    // ntile is the oracle. No partitionless window over customers.
    "customer_rfm" -> ((s, dir) => {
      import graft.operators.GlobalRank
      val d = (c: Column) => c.cast("double")
      val base = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("recency"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = base.select(count(lit(1)).as("n_total"))
      def score(df: DataFrame, value: Column, shard: Column,
          name: String): DataFrame = {
        val ranked = GlobalRank.withGlobalRank(df,
          Seq(value, col("o_custkey")), shard, "__rn")
        ranked.crossJoin(broadcast(n))
          .withColumn(name, GlobalRank.ntileOf(col("__rn"),
            col("n_total"), 5).cast("long"))
          .drop("__rn", "n_total")
      }
      // one sampling job for both shard-boundary sets
      val bounds = base.agg(
        percentile_approx(d(col("frequency")),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("fb"),
        percentile_approx(d(col("monetary")),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("mb"))
        .first()
      val (fb, mb) = (bounds.getSeq[Double](0), bounds.getSeq[Double](1))
      val scored = score(
        score(
          score(base, col("recency"), year(col("recency")), "r_score"),
          col("frequency"), GlobalRank.rangeShard(d(col("frequency")), fb),
          "f_score"),
        col("monetary"), GlobalRank.rangeShard(d(col("monetary")), mb),
        "m_score")
      scored.select(col("o_custkey"), col("r_score"), col("f_score"),
          col("m_score"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .as("rfm"))
        .orderBy(col("o_custkey"))
    }),

    // weighted sweep: in-flight order VALUE per change day — the
    // time-weighted exposure metric (±price deltas ride the same
    // prefix-sum pass as the ±1 counts via withRunningTotals).
    // DECIMAL cents keep the running sum associative/exact; the final
    // cast to double is the only float op, identical in the oracle.
    "orders_open_value" -> ((s, dir) => {
      val lastShip = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      val spans = Tables.orders(s, dir)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .select(to_date(col("o_orderdate")).as("start_day"),
          greatest(to_date(col("last_ship")), to_date(col("o_orderdate")))
            .as("end_day"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      graft.operators.IntervalSweep
        .openAggregates(spans, "start_day", "end_day", col("price"),
          d => year(d))
        .select(col("day").cast("timestamp").as("day"), col("n_open"),
          col("open_value").cast("double").as("open_value"))
        .orderBy(col("day"))
    }),

    // per-group HLL registers: distinct users per event type as
    // mergeable sketch state — |types|x64 register rows shuffle, not
    // the users. The estimate-per-group path is DetSketchSpec's job;
    // the state is hash-exact here.
    "agg_hll_by_group" -> ((s, dir) => {
      graft.operators.DetSketch.hllRegistersBy(
          Tables.events(s, dir).select(col("event_type"), col("user_id")),
          Seq("event_type"), "user_id", p = 6)
        .orderBy(col("event_type"), col("bucket"))
    }),

    // the Aggregator-state form of the grouped sketch: ONE 64-long
    // register buffer per (partition, group) shuffles — 64x fewer
    // rows than the (bucket, rho) explode — merged pointwise in the
    // udaf; exploding the final array reproduces the row form, so the
    // same oracle applies.
    "agg_hll_group_state" -> ((s, dir) => {
      val hll = graft.operators.DetSketch.hllUdaf(6)
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(hll(col("user_id").cast("string")).as("regs"))
        .select(col("event_type"),
          posexplode(col("regs")).as(Seq("bucket", "register")))
        .filter(col("register") > 0)
        .select(col("event_type"), col("bucket").cast("long").as("bucket"),
          col("register"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // KMV bottom-k sketch: the k smallest distinct key hashes — the
    // mergeable distinct-count/set-op sketch whose STATE is exactly
    // reproducible in any engine (ORDER BY hash LIMIT k). Plan is a
    // map-side-combined distinct + TakeOrderedAndProject; the only
    // window runs over the k-row result.
    "agg_kmv_bottomk" -> ((s, dir) => {
      graft.operators.DetSketch.kmvBottomK(
          Tables.lineitem(s, dir).select(col("l_orderkey")),
          "l_orderkey", k = 32)
        .orderBy(col("rank"))
    }),

    // theta-style KMV set operations: estimate |A∪B| and |A∩B| for
    // A = orderkeys shipped with returnflag R, B = returnflag A, from
    // two bottom-128 sketches — the mergeable-set-algebra sketch (the
    // reason to keep KMV next to HLL: HLL unions but cannot
    // intersect). Sketch state, thetas, sample counts and the double
    // estimates all replay exactly in the oracle (deterministic md5
    // hash); estimator accuracy vs exact distinct counts is
    // KmvSetOpsSpec. At 100 TB each side is one map-side-combined
    // distinct + TakeOrdered(128); the joins run over k-row frames.
    "kmv_set_ops" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.operators.DetSketch.kmvSetOps(
        li.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        li.filter(col("l_returnflag") === "A").select(col("l_orderkey")),
        "l_orderkey", k = 128)
    }),

    // mergeable approximate quantiles from a DETERMINISTIC uniform
    // sample: the k rows with the lowest md5 rank (KMV-style bottom-k —
    // bottom-k of a union ≡ bottom-k of merged bottom-ks, so partial
    // sketches combine associatively across partitions/batches; the
    // shuffle carries k rows per partition via TakeOrdered, never the
    // data). Quantile estimates are exact percentiles OF THE SAMPLE,
    // and the query also measures its own error: the estimate's TRUE
    // rank over the full table in pure-integer ppm. Engine-portable
    // determinism (seeded by md5, not by partitioning) is what makes an
    // approximate quantile ORACLE-EXACT — DuckDB replays the identical
    // sample.
    "agg_quantile_sample" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_extendedprice").as("v"),
        expr("""cast(conv(substring(md5(cast(concat_ws('-',
             l_orderkey, l_linenumber) as binary)), 1, 15), 16, 10)
             as long)""").as("hk"))
      val est = li.orderBy(col("hk"), col("v")).limit(4096)
        .agg(count(lit(1)).as("k"),
          percentile(col("v"), lit(0.5)).as("p50_est"),
          percentile(col("v"), lit(0.95)).as("p95_est"))
      li.crossJoin(broadcast(est))
        .agg(max(col("k")).as("k"), count(lit(1)).as("n"),
          max(col("p50_est")).as("p50_est"),
          expr("sum(case when v <= p50_est then 1L else 0L end) " +
            "* 1000000L div count(1)").as("p50_rank_ppm"),
          max(col("p95_est")).as("p95_est"),
          expr("sum(case when v <= p95_est then 1L else 0L end) " +
            "* 1000000L div count(1)").as("p95_rank_ppm"))
    }),

    // skyline (Pareto-optimal parts): cheapest-for-the-size frontier —
    // no other part is both <= price and >= size with one strict.
    // Grid prune (64²) drops every cell strictly dominated at cell
    // granularity, exact dominance anti-join runs only on survivors;
    // the oracle is the definitional NOT EXISTS over all n² pairs.
    "skyline_parts" -> ((s, dir) => {
      graft.operators.Skyline.of(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
          Seq(col("p_retailprice"), -col("p_size")))
        .orderBy(col("p_partkey"))
    }),

    // grouped OLS regression: o_totalprice against the order's line
    // count, per order priority — a two-level aggregate (per-order line
    // counts, then per-priority moment sums). All five moments are
    // exact (BIGINT / DECIMAL partial+final aggs, associative), so the
    // slope/intercept/r² doubles derive from order-free inputs; floor
    // at ppm / cent granularity absorbs nothing — both engines run the
    // identical expression tree on identical exact moments.
    "stats_regression" -> ((s, dir) => {
      val d = (c: Column) => c.cast("double")
      val counts = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("x"))
      val ord = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice").cast("decimal(18,2)").as("y"))
      val agg = ord.join(counts, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum((col("x").cast("decimal(18,2)") * col("y")).cast("decimal(38,4)"))
            .as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,4)")).as("syy"))
      val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
      val dx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val dy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
      val slope = num / dx
      agg.select(col("o_orderpriority"), col("n"),
          floor(slope * lit(1000000.0)).cast("bigint").as("slope_ppm"),
          floor(((d(col("sy")) - slope * d(col("sx"))) / d(col("n")))
            * lit(100.0)).cast("bigint").as("intercept_cents"),
          floor((num * num / (dx * dy)) * lit(1000000.0)).cast("bigint")
            .as("r2_ppm"))
        .orderBy(col("o_orderpriority"))
    }),

    // global Spearman rank correlation (quantity vs extendedprice) via
    // graft.operators.GlobalRank: BOTH rank passes are sharded by a
    // value band monotone in their sort order — no partitionless
    // window, no single-task global sort (the trap a naive
    // row_number() OVER (ORDER BY ...) springs at scale). Ties are
    // broken by the unique (l_orderkey, l_linenumber), making ranks a
    // permutation, so rho = 1 - 6·Σd²/(n(n²-1)) holds exactly with
    // integer d²; Σd² accumulates in DECIMAL(38,0) (≈ n³/6 overflows
    // BIGINT past ~3.8M rows).
    "stats_spearman" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      val tie = Seq(col("l_orderkey"), col("l_linenumber"))
      val rx = graft.operators.GlobalRank.withGlobalRank(li,
        col("l_quantity") +: tie, floor(col("l_quantity") / lit(4)).cast("int"),
        "rx")
      val rxy = graft.operators.GlobalRank.withGlobalRank(rx,
        col("l_extendedprice") +: tie,
        floor(col("l_extendedprice") / lit(8192)).cast("int"), "ry")
      val d = (c: Column) => c.cast("double")
      val agg = rxy.select(((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast("decimal(38,0)").as("d2"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd2"))
      agg.select(col("n"), d(col("sd2")).as("sum_d2"),
        floor((lit(1.0) - lit(6.0) * d(col("sd2")) /
          (d(col("n")) * (d(col("n")) * d(col("n")) - lit(1.0))))
          * lit(1000000.0)).cast("bigint").as("rho_ppm"))
    }),

    // transparent materialized-view rewrite (plans.MvRewrite): build
    // the (flag, status) partial table once, then run an UNCHANGED
    // base-table aggregate — with a group-column filter and decimal
    // measures — and let the optimizer swap the base scan for an
    // O(|groups|) rollup of the view. The rewrite is forced eagerly
    // (optimizedPlan), asserted (a silent non-rewrite would make this
    // query a plain aggregate — we require the view scan), and the
    // registration is dropped before returning so no other query in
    // the session can match. The oracle computes the same aggregate
    // from the BASE table: hash-equality proves rewrite correctness,
    // not just plan shape. At 100 TB the rewritten plan reads KBs
    // instead of the full fact table.
    "mv_rewrite_rollup" -> ((s, dir) => {
      import graft.plans.Mv
      graft.plans.MvRewrite.ensureRegistered(s) // extension-less sessions
      val base = s"$dir/lineitem.parquet"
      // dir-hash suffix: concurrent runs at different scale factors
      // must not overwrite each other's view mid-query (same
      // convention as every tmp-writing cdc query)
      val viewPath = s"${System.getProperty("java.io.tmpdir")}/graft-mv-lineitem-" +
        java.lang.Integer.toHexString(dir.hashCode)
      Mv.create(s, base, viewPath, Seq("l_returnflag", "l_linestatus"),
        Seq(Mv.Measure("l_quantity", Some("decimal(18,2)")),
          Mv.Measure("l_extendedprice", Some("decimal(18,2)"))))
      try {
        val df = s.read.parquet(base)
          .filter(col("l_returnflag") =!= "N")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"),
            min(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("min_qty"),
            max(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("max_price"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
        df.queryExecution.optimizedPlan // force the rewrite NOW
        require(Mv.readsView(df, viewPath), "MV rewrite did not fire")
        df
      } finally Mv.deregister(base)
    }),

    // collation-aware grouping (a Spark 4 engine feature): market
    // segments get deterministic case noise (even keys upper, odd
    // lower), then group under the UTF8_LCASE collation — the engine's
    // hash aggregate treats 'BUILDING' and 'building' as ONE key with
    // no lower() materialized in the data path. Output avoids the
    // nondeterministic group representative: min() over the raw
    // variants (uppercase sorts first in both engines' binary order)
    // plus an exact-distinct census proving two case variants really
    // did collapse per group. Oracle: GROUP BY lower(seg).
    "collate_group" -> ((s, dir) => {
      val seg = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment")))
      Tables.customer(s, dir)
        .select(col("c_custkey"), seg.as("seg"))
        .groupBy(collate(col("seg"), "UTF8_LCASE"))
        .agg(min(col("seg")).as("first_variant"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("seg")).as("n_variants"))
        .select(col("first_variant"), col("n_rows"), col("n_variants"))
        .orderBy(col("first_variant"))
    }),
  )

  private val disc = "(1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2))"
  private val revenueSql =
    s"CAST(SUM(l_extendedprice::DECIMAL(18,2) * $disc) AS DOUBLE) AS revenue"

  val oracle: Map[String, String] = Map(
    "pareto_customers" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2)) AS spend
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT o_custkey, spend,
        |    sum(spend) OVER (ORDER BY spend DESC, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        |  FROM spend),
        |t AS (SELECT sum(spend) AS tot FROM spend)
        |SELECT decile, count(*) AS n_customers,
        |  CAST(sum(spend) AS DOUBLE) AS decile_spend,
        |  CAST(floor((CAST(max(cum) AS DOUBLE) * 10000.0)
        |    / CAST(max(t.tot) AS DOUBLE)) AS BIGINT) AS cum_share_bp
        |FROM r CROSS JOIN t
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "basket_pairs" ->
      s"""WITH items0 AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ok AS (
        |  SELECT l_orderkey FROM items0
        |  GROUP BY 1 HAVING count(*) <= $MaxBasket),
        |items AS (
        |  SELECT i.* FROM items0 i JOIN ok USING (l_orderkey)),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*) AS n_orders
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, n_orders FROM p
        |WHERE n_orders >= 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 200""".stripMargin,

    "item_similarity" ->
      s"""WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |f AS (
        |  SELECT l_partkey, count(*) AS n FROM items GROUP BY 1),
        |ok AS (
        |  SELECT l_orderkey FROM items
        |  GROUP BY 1 HAVING count(*) <= $MaxBasket),
        |capped AS (
        |  SELECT i.* FROM items i JOIN ok USING (l_orderkey)),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*) AS n_ab
        |  FROM capped a JOIN capped b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, n_ab, fa.n AS n_a, fb.n AS n_b,
        |  (n_ab * n_ab * 100000000) // (fa.n * fb.n) AS sim2_e8
        |FROM p
        |JOIN f fa ON part_a = fa.l_partkey
        |JOIN f fb ON part_b = fb.l_partkey
        |WHERE n_ab >= 2
        |ORDER BY sim2_e8 DESC, part_a, part_b LIMIT 200""".stripMargin,

    "quantile_buckets" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT bucket, count(*) AS n,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "window_range_frame" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(ts::TIMESTAMP) // 1000 AS es,
        |    value::DECIMAL(18,2) AS v
        |  FROM events)
        |SELECT user_id, event_id, es,
        |  count(v) OVER w AS n_in_hour,
        |  CAST(sum(v) OVER w AS DOUBLE) AS sum_in_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, es, event_id""".stripMargin,

    "profile_skew" ->
      """WITH ec AS (
        |  SELECT count(*) AS cnt FROM events GROUP BY user_id),
        |lc AS (
        |  SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey),
        |e AS (
        |  SELECT 'events.user_id' AS key_col, count(*) AS n_keys,
        |    sum(cnt)::BIGINT AS n_rows,
        |    quantile_cont(cnt, 0.5) AS p50,
        |    quantile_cont(cnt, 0.99) AS p99,
        |    max(cnt) AS max_cnt,
        |    CAST(floor(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
        |      / CAST(sum(cnt)::BIGINT AS DOUBLE) * 1000000.0) AS BIGINT)
        |      AS skew_ppm
        |  FROM ec),
        |l AS (
        |  SELECT 'lineitem.l_orderkey' AS key_col, count(*) AS n_keys,
        |    sum(cnt)::BIGINT AS n_rows,
        |    quantile_cont(cnt, 0.5) AS p50,
        |    quantile_cont(cnt, 0.99) AS p99,
        |    max(cnt) AS max_cnt,
        |    CAST(floor(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
        |      / CAST(sum(cnt)::BIGINT AS DOUBLE) * 1000000.0) AS BIGINT)
        |      AS skew_ppm
        |  FROM lc)
        |SELECT * FROM e UNION ALL SELECT * FROM l ORDER BY key_col""".stripMargin,

    "events_autocorr" ->
      """WITH hourly AS (
        |  SELECT epoch_ms(date_trunc('hour', ts::TIMESTAMP)) // 3600000
        |      AS he,
        |    count(*) AS n
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT l.lag_h, x.n AS x, y.n AS y
        |  FROM (VALUES (1), (24)) AS l(lag_h)
        |  JOIN hourly x ON TRUE
        |  JOIN hourly y ON y.he = x.he + l.lag_h),
        |a AS (
        |  SELECT lag_h, count(*) AS n_pairs,
        |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * y)::BIGINT AS sxy,
        |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        |  FROM lagged GROUP BY 1)
        |SELECT lag_h::BIGINT AS lag_h, n_pairs,
        |  CAST(floor(((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        |    * 1000000.0) AS BIGINT) AS r_ppm
        |FROM a ORDER BY lag_h""".stripMargin,

    "events_interarrival" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us
        |  FROM events),
        |g AS (
        |  SELECT (us - lag(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id)) // 1000000 AS gap_s
        |  FROM e),
        |f AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL)
        |SELECT count(*) AS n_gaps,
        |  quantile_cont(gap_s, 0.5) AS p50_s,
        |  quantile_cont(gap_s, 0.9) AS p90_s,
        |  max(gap_s) AS max_s,
        |  sum(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_over_hour
        |FROM f""".stripMargin,

    "events_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(value::DECIMAL(18,2) * 100 AS BIGINT) AS cents
        |  FROM events),
        |s AS (
        |  SELECT user_id, count(*) AS n_events,
        |    list(cents ORDER BY event_id) AS seq
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n_events,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), seq),
        |    (acc, x) -> (acc + x) // 2) AS ewma_cents
        |FROM s ORDER BY user_id""".stripMargin,

    "events_anomaly_zscore" ->
      """WITH b AS (
        |  SELECT user_id, event_id, value::DECIMAL(18,2) AS v,
        |    count(value::DECIMAL(18,2)) OVER w AS n_prev,
        |    sum(value::DECIMAL(18,2)) OVER w AS sx,
        |    sum(CAST(value::DECIMAL(18,2) * value::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) OVER w AS sxx
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT * FROM b WHERE n_prev >= 5),
        |sc AS (
        |  SELECT user_id, event_id, n_prev,
        |    CAST(v AS DOUBLE) AS vd,
        |    CAST(sx AS DOUBLE) / CAST(n_prev AS DOUBLE) AS mu,
        |    sqrt((CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n_prev AS DOUBLE)))
        |      / CAST(n_prev - 1 AS DOUBLE)) AS sg
        |  FROM f)
        |SELECT user_id, event_id, n_prev,
        |  CAST(floor(((vd - mu) / sg) * 1000000.0) AS BIGINT) AS z_ppm
        |FROM sc
        |WHERE sg > 0 AND abs((vd - mu) / sg) >= 2.5
        |ORDER BY user_id, event_id""".stripMargin,

    "stats_correlation" ->
      """WITH a AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity::DECIMAL(18,2)) AS sx,
        |    sum(l_extendedprice::DECIMAL(18,2)) AS sy,
        |    sum(CAST(l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) AS sxy,
        |    sum(CAST(l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) AS sxx,
        |    sum(CAST(l_extendedprice::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) AS sum_x, CAST(sy AS DOUBLE) AS sum_y,
        |  CAST(floor(
        |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |      sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        |    * 1000000.0) AS BIGINT) AS corr_ppm
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "events_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts::TIMESTAMP > t1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.ts::TIMESTAMP > t2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM t1
        |UNION ALL
        |SELECT '2_click_after_view', count(*) FROM t2
        |UNION ALL
        |SELECT '3_purchase_after_click', count(*) FROM t3
        |ORDER BY stage""".stripMargin,

    "events_transitions" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    coalesce(lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id), 'START') AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS curr_type, count(*) AS n
        |FROM r GROUP BY prev_type, curr_type
        |ORDER BY prev_type, curr_type""".stripMargin,

    "join_skew_salted" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value::DECIMAL(18,2) AS v
        |  FROM events),
        |d AS (SELECT user_id, count(*) AS n_user_events FROM e
        |  GROUP BY user_id)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(e.v * d.n_user_events) AS DOUBLE) AS weighted_value
        |FROM e JOIN d ON e.user_id = d.user_id
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "cohort_retention" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS m
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey)
        |SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
        |  CAST(datediff('month', f.cohort, o.m) AS INT) AS month_offset,
        |  count(DISTINCT o.o_custkey) AS n_customers
        |FROM o JOIN f ON o.o_custkey = f.o_custkey
        |GROUP BY 1, 2 ORDER BY cohort_month, month_offset""".stripMargin,

    "string_shaping" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  rpad(substr(p_type, 1, 6), 10, '.') AS type_pad,
        |  translate(p_name, 'aeiou', 'AEIOU') AS name_caps_vowels,
        |  trim(' x ', ' ') AS trimmed,
        |  reverse(p_brand) AS brand_rev,
        |  repeat('-', 5) AS rule
        |FROM part WHERE p_partkey <= 100
        |ORDER BY p_partkey""".stripMargin,

    "date_arith" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', o_orderdate::DATE, DATE '1998-12-31')
        |    AS INT) AS days_to_eoy,
        |  strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS due_date,
        |  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d')
        |    AS month_end,
        |  strftime(o_orderdate, '%Y-%m') AS order_month
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_orderkey""".stripMargin,

    "window_rank_stats" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin,

    "agg_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderstatus,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS priciest_order,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
        |  max(o_totalprice) AS max_price
        |FROM r GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "unpivot_metrics" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE)
        |      AS total_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, metric, value FROM wide
        |UNPIVOT (value FOR metric IN (total_price, n_orders, n_customers))
        |ORDER BY o_orderstatus, metric""".stripMargin,

    "id_gap_detection" ->
      """WITH b AS (
        |  SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |  FROM orders),
        |e AS (SELECT unnest(range(lo, hi + 1)) AS expected_key FROM b)
        |SELECT expected_key FROM e
        |WHERE expected_key NOT IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0)
        |ORDER BY expected_key LIMIT 100""".stripMargin,

    "agg_boolean" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
        |  bool_or(o_orderstatus = 'F') AS any_final,
        |  bool_and(o_custkey IS NOT NULL) AS keys_complete
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "null_semantics" ->
      """WITH t AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END
        |      AS clerk_n,
        |    nullif(o_orderpriority, '3-MEDIUM') AS prio_n
        |  FROM orders WHERE o_custkey < 100)
        |SELECT o_custkey, count(*) AS n_rows,
        |  count(clerk_n) AS n_clerk,
        |  CAST(sum(CASE WHEN clerk_n IS NOT DISTINCT FROM NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe,
        |  CAST(sum(CASE WHEN prio_n IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_medium,
        |  min(coalesce(prio_n, '(none)')) AS min_prio
        |FROM t GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "topk_per_group" ->
      """WITH scored AS (
        |  SELECT o_custkey, o_orderkey,
        |    o_totalprice + o_orderkey::DOUBLE * 0.000000001 AS score
        |  FROM orders WHERE o_custkey < 200)
        |SELECT o_custkey, o_orderkey, score FROM (
        |  SELECT o_custkey, o_orderkey, score,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY score DESC) AS rk
        |  FROM scored)
        |WHERE rk <= 3 ORDER BY o_custkey, score DESC""".stripMargin,

    "cross_join_grid" ->
      """WITH s AS (SELECT DISTINCT o_orderstatus AS status FROM orders),
        |p AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
        |c AS (
        |  SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |    count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT s.status, p.priority, coalesce(c.n, 0) AS n
        |FROM s CROSS JOIN p
        |LEFT JOIN c ON c.status = s.status AND c.priority = p.priority
        |ORDER BY s.status, p.priority""".stripMargin,

    "join_full_outer" ->
      """WITH od AS (
        |  SELECT o_orderdate AS day, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |sd AS (
        |  SELECT l_shipdate AS day, count(*) AS n_ships
        |  FROM lineitem GROUP BY 1)
        |SELECT day, n_orders, n_ships
        |FROM od FULL JOIN sd USING (day)
        |ORDER BY day""".stripMargin,

    "window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  lead(o_totalprice, 1, 0.0) OVER w AS next_price,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "agg_percentiles_exact" ->
      """SELECT quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "outlier_iqr" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.25) AS p25,
        |    quantile_cont(l_quantity, 0.75) AS p75,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT li.l_returnflag, min(q.n) AS n,
        |  min(q.p25) AS p25, min(q.p75) AS p75,
        |  CAST(sum(CASE WHEN li.l_quantity < q.p25 - (q.p75 - q.p25) * 1.5
        |      OR li.l_quantity > q.p75 + (q.p75 - q.p25) * 1.5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem li JOIN q ON li.l_returnflag = q.l_returnflag
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,

    "profile_lineitem" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS null_flags,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,

    "lateral_top2_orders" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 100
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "set_ops_all" ->
      """WITH e AS (
        |  SELECT c_nationkey::INT AS nkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey::INT AS nkey FROM supplier)
        |SELECT nkey, count(*) AS n_surviving
        |FROM e GROUP BY nkey ORDER BY nkey""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(l_extendedprice::DECIMAL(18,2) * $disc) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT l_orderkey, o_orderdate, $revenueSql
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, $revenueSql
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "join_broadcast_part" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(SUM(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(SUM(o_totalprice::DECIMAL(18,2)) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |QUALIFY o_custkey < 50
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_top3_per_cust" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "agg_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "set_ops_keys" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey::INT AS nkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey::INT AS nkey FROM supplier)
        |SELECT nkey, 'both' AS src FROM (SELECT nkey FROM cn INTERSECT SELECT nkey FROM sn)
        |UNION ALL
        |SELECT nkey, 'cust_only' AS src FROM (SELECT nkey FROM cn EXCEPT SELECT nkey FROM sn)
        |ORDER BY nkey, src""".stripMargin,

    "rollup_flag_status" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS n,
        |  CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "agg_pivot_priority" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END) AS n_urgent,
        |  count(CASE WHEN o_orderpriority LIKE '2%' THEN 1 END) AS n_high,
        |  count(CASE WHEN o_orderpriority NOT LIKE '1%'
        |    AND o_orderpriority NOT LIKE '2%' THEN 1 END) AS n_rest,
        |  CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 12) AS name12,
        |  length(p_name) AS name_len,
        |  p_brand || ':' || p_type AS brand_type,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "date_parts" ->
      """SELECT EXTRACT(year FROM o_orderdate)::INT AS y,
        |  EXTRACT(month FROM o_orderdate)::INT AS m,
        |  count(*) AS n_orders,
        |  CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,

    "scalar_subquery_avg" ->
      """WITH ca AS (
        |  SELECT o_custkey AS ck,
        |    CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderstatus, count(*) AS n_above_avg
        |FROM orders JOIN ca ON o_custkey = ck
        |WHERE o_totalprice > avg_price
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "cube_flag_status" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "cdc_compaction" ->
      """WITH unioned AS (
        |  SELECT o_orderkey, o_totalprice, 0 AS version
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CAST(o_totalprice::DECIMAL(18,2) * 2.00::DECIMAL(18,2) AS DOUBLE),
        |    1 AS version
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |latest AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM unioned)
        |SELECT count(*) AS n_keys,
        |  CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM latest WHERE rn = 1""".stripMargin,

    "events_session_stats" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec
        |  FROM events WHERE user_id < 50),
        |lagged AS (
        |  SELECT user_id, event_id, ts_sec,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |           OR ts_sec - lag(ts_sec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |assigned AS (
        |  SELECT user_id, ts_sec,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM lagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  CAST(max(ts_sec) - min(ts_sec) AS BIGINT) AS duration_sec
        |FROM assigned GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "events_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, ts_sec,
        |    lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |      AS prev_sec
        |  FROM t)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 1800
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM lagged GROUP BY user_id ORDER BY user_id""".stripMargin,

    // containment count per change day — the direct (quadratic) form
    // of the sweep-line prefix sum
    "orders_open_by_day" ->
      """WITH spans AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS start_day,
        |    GREATEST(CAST(m.last_ship AS DATE),
        |      CAST(o.o_orderdate AS DATE)) AS end_day
        |  FROM orders o JOIN (
        |    SELECT l_orderkey, max(l_shipdate) AS last_ship
        |    FROM lineitem GROUP BY l_orderkey) m
        |    ON o.o_orderkey = m.l_orderkey),
        |days AS (
        |  SELECT DISTINCT day FROM (
        |    SELECT start_day AS day FROM spans
        |    UNION ALL
        |    SELECT end_day + 1 FROM spans))
        |SELECT CAST(d.day AS TIMESTAMP) AS day, count(s.start_day) AS n_open
        |FROM days d LEFT JOIN spans s
        |  ON s.start_day <= d.day AND d.day <= s.end_day
        |GROUP BY d.day ORDER BY d.day""".stripMargin,

    // identical md5-60bit fold; rho via bit length = length(bin(w)),
    // exact integers in both engines
    "agg_hll_registers" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM lineitem)
        |SELECT h % 64 AS bucket,
        |  CAST(max(CASE WHEN h // 64 = 0 THEN 55
        |    ELSE 55 - length(bin(h // 64)) END) AS BIGINT) AS register
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,

    "agg_cms_counters" ->
      """WITH e AS (
        |  SELECT r.d,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
        |      (r.d - 1) * 8 + 1, 8))::BIGINT % 64 AS w
        |  FROM lineitem CROSS JOIN range(1, 5) r(d))
        |SELECT d, w, count(*) AS cnt FROM e
        |GROUP BY d, w ORDER BY d, w""".stripMargin,

    "orders_priority_mix" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
        |    o_orderpriority AS priority, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT month, priority, n,
        |  CAST((10000 * n) // sum(n) OVER (PARTITION BY month)
        |    AS BIGINT) AS share_bp
        |FROM m ORDER BY month, priority""".stripMargin,

    "events_hourly_uniques" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,

    // replays the sequential clamp recurrence per prefix (quadratic,
    // oracle-only) — green ⇒ the closed form used by Spark is right
    "events_clamped_balance" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(value::DECIMAL(18,2) * 100 AS BIGINT) - 5000 AS delta
        |  FROM events),
        |s AS (
        |  SELECT user_id, list(delta ORDER BY event_id) AS ds,
        |    list(event_id ORDER BY event_id) AS ids
        |  FROM e GROUP BY user_id),
        |x AS (
        |  SELECT user_id, unnest(ids) AS event_id,
        |    unnest(range(1, len(ds) + 1)) AS i, ds
        |  FROM s)
        |SELECT user_id, event_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), ds[1:i]),
        |    (acc, x) -> GREATEST(0, acc + x)) AS balance_cents
        |FROM x ORDER BY user_id, event_id""".stripMargin,

    "join_null_safe" ->
      """WITH a AS (
        |  SELECT nullif(event_type, 'error') AS k, count(*) AS n_a
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT nullif(event_type, 'error') AS k, count(*) AS n_b
        |  FROM events WHERE value > 50 GROUP BY 1)
        |SELECT a.k, a.n_a, COALESCE(b.n_b, 0) AS n_b
        |FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS FIRST""".stripMargin,

    "validate_lineitem" ->
      """WITH p AS (
        |  SELECT
        |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS v_nn,
        |    SUM(CASE WHEN NOT (l_quantity IS NOT NULL AND l_quantity >= 1
        |      AND l_quantity <= 49) THEN 1 ELSE 0 END)::BIGINT AS v_qty,
        |    SUM(CASE WHEN NOT (l_returnflag IS NOT NULL
        |      AND l_returnflag IN ('A', 'N', 'R')) THEN 1 ELSE 0 END)
        |      ::BIGINT AS v_rf,
        |    SUM(CASE WHEN NOT (l_discount IS NOT NULL AND l_discount >= 0.0
        |      AND l_discount <= 0.1) THEN 1 ELSE 0 END)::BIGINT AS v_disc
        |  FROM lineitem),
        |u AS (
        |  SELECT COALESCE(SUM(n), 0)::BIGINT AS v FROM (
        |    SELECT count(*) AS n FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)),
        |fk AS (
        |  SELECT count(*)::BIGINT AS v FROM lineitem l
        |  WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT * FROM (
        |  SELECT 'accepted_values(l_returnflag)' AS "check",
        |    v_rf AS n_violations, v_rf = 0 AS pass FROM p
        |  UNION ALL SELECT 'fk(l_orderkey)', v, v = 0 FROM fk
        |  UNION ALL SELECT 'in_range(l_discount)', v_disc, v_disc = 0 FROM p
        |  UNION ALL SELECT 'in_range(l_quantity)', v_qty, v_qty = 0 FROM p
        |  UNION ALL SELECT 'not_null(l_shipdate)', v_nn, v_nn = 0 FROM p
        |  UNION ALL SELECT 'unique(order,line)', v, v = 0 FROM u)
        |ORDER BY "check"""".stripMargin,

    "events_top_paths" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS ts_sec
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, event_type, ts_sec,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |           OR ts_sec - lag(ts_sec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |assigned AS (
        |  SELECT user_id, event_id, event_type, ts_sec,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM lagged),
        |triples AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w2 AS e2,
        |    lead(event_type, 2) OVER w2 AS e3
        |  FROM assigned
        |  WINDOW w2 AS (PARTITION BY user_id, session_idx
        |    ORDER BY ts_sec, event_id))
        |SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
        |FROM triples WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "events_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |wau AS (
        |  SELECT d.day, count(DISTINCT u.user_id) AS wau
        |  FROM (SELECT DISTINCT day FROM ud) d
        |  JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau,
        |  (10000 * d.dau) // w.wau AS stickiness_bp
        |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin,

    "customer_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS recency,
        |    count(*) AS frequency,
        |    sum(o_totalprice::DECIMAL(18,2)) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |scored AS (
        |  SELECT o_custkey,
        |    CAST(ntile(5) OVER (ORDER BY recency, o_custkey) AS BIGINT)
        |      AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT)
        |      AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT)
        |      AS m_score
        |  FROM base)
        |SELECT o_custkey, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS rfm
        |FROM scored ORDER BY o_custkey""".stripMargin,

    "orders_open_value" ->
      """WITH spans AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS start_day,
        |    GREATEST(CAST(m.last_ship AS DATE),
        |      CAST(o.o_orderdate AS DATE)) AS end_day,
        |    o.o_totalprice::DECIMAL(18,2) AS price
        |  FROM orders o JOIN (
        |    SELECT l_orderkey, max(l_shipdate) AS last_ship
        |    FROM lineitem GROUP BY l_orderkey) m
        |    ON o.o_orderkey = m.l_orderkey),
        |days AS (
        |  SELECT DISTINCT day FROM (
        |    SELECT start_day AS day FROM spans
        |    UNION ALL
        |    SELECT end_day + 1 FROM spans))
        |SELECT CAST(d.day AS TIMESTAMP) AS day,
        |  count(s.start_day) AS n_open,
        |  CAST(COALESCE(sum(s.price), 0) AS DOUBLE) AS open_value
        |FROM days d LEFT JOIN spans s
        |  ON s.start_day <= d.day AND d.day <= s.end_day
        |GROUP BY d.day ORDER BY day""".stripMargin,

    "agg_hll_by_group" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM events)
        |SELECT event_type, h % 64 AS bucket,
        |  CAST(max(CASE WHEN h // 64 = 0 THEN 55
        |    ELSE 55 - length(bin(h // 64)) END) AS BIGINT) AS register
        |FROM h GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // identical ground truth as agg_hll_by_group (state form ≡ rows)
    "agg_hll_group_state" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM events)
        |SELECT event_type, h % 64 AS bucket,
        |  CAST(max(CASE WHEN h // 64 = 0 THEN 55
        |    ELSE 55 - length(bin(h // 64)) END) AS BIGINT) AS register
        |FROM h GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    "agg_kmv_bottomk" ->
      """WITH h AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM lineitem),
        |b AS (SELECT h FROM h ORDER BY h LIMIT 32)
        |SELECT row_number() OVER (ORDER BY h) AS rank, h
        |FROM b ORDER BY rank""".stripMargin,

    "kmv_set_ops" ->
      """WITH ka AS (
        |  SELECT h FROM (SELECT DISTINCT
        |      ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |        ::BIGINT AS h
        |    FROM lineitem WHERE l_returnflag = 'R')
        |  ORDER BY h LIMIT 128),
        |kb AS (
        |  SELECT h FROM (SELECT DISTINCT
        |      ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |        ::BIGINT AS h
        |    FROM lineitem WHERE l_returnflag = 'A')
        |  ORDER BY h LIMIT 128),
        |ku AS (
        |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        |  ORDER BY h LIMIT 128),
        |a AS (SELECT count(*) AS n_a, max(h) AS theta_a FROM ka),
        |b AS (SELECT count(*) AS n_b, max(h) AS theta_b FROM kb),
        |u AS (SELECT count(*) AS n_union_k, max(h) AS theta_u FROM ku),
        |j AS (SELECT *, least(theta_a, theta_b) AS theta
        |  FROM a CROSS JOIN b CROSS JOIN u),
        |i AS (SELECT count(*) AS n_inter
        |  FROM ka JOIN kb USING (h) CROSS JOIN j
        |  WHERE h <= j.theta)
        |SELECT n_a, theta_a, n_b, theta_b, theta, n_union_k, theta_u,
        |  n_inter,
        |  CASE WHEN n_union_k < 128 THEN CAST(n_union_k AS DOUBLE)
        |    ELSE CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |      / CAST(theta_u AS DOUBLE) END AS union_est,
        |  CAST(n_inter AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |    / CAST(theta AS DOUBLE) AS inter_est
        |FROM j CROSS JOIN i""".stripMargin,

    "agg_quantile_sample" ->
      """WITH li AS (
        |  SELECT l_extendedprice AS v,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '-'
        |      || l_linenumber::VARCHAR), 1, 15))::BIGINT AS hk
        |  FROM lineitem),
        |samp AS (SELECT v FROM li ORDER BY hk, v LIMIT 4096),
        |est AS (
        |  SELECT count(*) AS k,
        |    quantile_cont(v, 0.5) AS p50_est,
        |    quantile_cont(v, 0.95) AS p95_est
        |  FROM samp)
        |SELECT est.k, count(*) AS n,
        |  max(p50_est) AS p50_est,
        |  sum(CASE WHEN v <= p50_est THEN 1 ELSE 0 END)::BIGINT
        |    * 1000000 // count(*) AS p50_rank_ppm,
        |  max(p95_est) AS p95_est,
        |  sum(CASE WHEN v <= p95_est THEN 1 ELSE 0 END)::BIGINT
        |    * 1000000 // count(*) AS p95_rank_ppm
        |FROM li, est GROUP BY est.k""".stripMargin,

    "skyline_parts" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |      OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "stats_regression" ->
      """WITH x AS (
        |  SELECT l_orderkey, count(*) AS x FROM lineitem GROUP BY 1),
        |a AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    sum(x)::BIGINT AS sx,
        |    sum(o_totalprice::DECIMAL(18,2)) AS sy,
        |    sum(CAST(x::DECIMAL(18,2) * o_totalprice::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) AS sxy,
        |    sum(x * x)::BIGINT AS sxx,
        |    sum(CAST(o_totalprice::DECIMAL(18,2) * o_totalprice::DECIMAL(18,2)
        |      AS DECIMAL(38,4))) AS syy
        |  FROM orders JOIN x ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS slope_ppm,
        |  CAST(floor(((CAST(sy AS DOUBLE)
        |      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
        |    * 100.0) AS BIGINT) AS intercept_cents,
        |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        |    * 1000000.0) AS BIGINT) AS r2_ppm
        |FROM a ORDER BY o_orderpriority""".stripMargin,

    "stats_spearman" ->
      """WITH r AS (
        |  SELECT
        |    row_number() OVER (ORDER BY l_quantity, l_orderkey, l_linenumber)
        |      AS rx,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS ry
        |  FROM lineitem),
        |a AS (
        |  SELECT count(*) AS n, sum((rx - ry) * (rx - ry)) AS sd2 FROM r)
        |SELECT n, CAST(sd2 AS DOUBLE) AS sum_d2,
        |  CAST(floor((1.0 - 6.0 * CAST(sd2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - 1.0)))
        |    * 1000000.0) AS BIGINT) AS rho_ppm
        |FROM a""".stripMargin,

    // the oracle aggregates the BASE table: equality proves the
    // view-rollup plan computes exactly what the base scan would
    "mv_rewrite_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS min_qty,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS max_price
        |FROM lineitem
        |WHERE l_returnflag <> 'N'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "collate_group" ->
      """WITH s AS (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |    ELSE lower(c_mktsegment) END AS seg
        |  FROM customer)
        |SELECT min(seg) AS first_variant, count(*) AS n_rows,
        |  count(DISTINCT seg) AS n_variants
        |FROM s GROUP BY lower(seg) ORDER BY first_variant""".stripMargin,
  )
}
