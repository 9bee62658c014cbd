package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The classic TPC-H decision-support battery over the testdata star
  * schema (q1/q3/q5 live in RelationalQueries since round 1; this file
  * adds the rest of the suite expressible on the slimmed schemas).
  * Queries whose official text needs columns the testdata lacks
  * (partsupp, l_commitdate/l_receiptdate, l_shipmode, c_phone) are
  * ADAPTED to available columns while preserving the plan shape that
  * makes each query interesting — the EXISTS semi-join of q4, the
  * OR-of-ANDs pushdown of q19, the double correlated EXISTS/NOT-EXISTS
  * of q21, the scalar-subquery + anti-join of q22. q2/q11/q16/q20 are
  * partsupp-centric; they run against a partsupp ANALOG derived from
  * lineitem (one row per observed (part, supplier) pair with exact
  * decimal quantity/value rollups and a min-unit-price supplycost —
  * see `partsupp` below), so all 22 query SHAPES are present.
  *
  * Scale notes (100 TB design): TRUE dimensions (nation/region/
  * supplier/filtered part, and derived scalar aggregates like q15's
  * max-revenue row or q22's threshold) carry explicit broadcast
  * hints. customer/orders and per-part aggregates scale WITH the
  * fact tables, so their joins stay plain shuffle joins — AQE still
  * broadcasts them at small SF where they fit, but nothing in the
  * plan REQUIRES a table that grows with the data to fit in executor
  * memory. The only mandatory shuffles are fact⨝fact joins on their
  * keys and the final grouped aggregations, all partial+final.
  * Money sums go through
  * DECIMAL(18,2) (exact, associative) and render as DOUBLE —
  * bit-identical between Spark's partial aggs and DuckDB's sequential
  * scan regardless of row order.
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private def revenue(ep: Column, disc: Column): Column =
    sum(dec(ep) * (lit(1).cast("decimal(18,2)") - dec(disc))).cast("double")
  private def ts(s: String): Column =
    lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** partsupp analog for q2/q11/q16/q20: the testdata has no partsupp
    * table, so derive one row per observed (part, supplier) pair from
    * lineitem. `ps_supplycost` = min observed unit price (IEEE divide
    * then MIN — both engines compute the identical double set, so
    * equality joins against the per-part MIN are exact);
    * `ps_availqty`/`ps_value` = exact DECIMAL(18,2) sums rendered as
    * DOUBLE. One partial+final hash aggregation on the pair key — at
    * 100 TB this is the same shuffle any partsupp-building compaction
    * would pay, and every consumer below reuses it.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
        sum(dec(col("l_quantity"))).cast("double").as("ps_availqty"),
        dsum(col("l_extendedprice")).as("ps_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q2: min-cost supplier — the correlated "cost = MIN(cost) over
    // this part's regional suppliers" subquery, expressed as a
    // per-part MIN aggregate joined back on (partkey, cost). The
    // supplier⨝nation⨝region prune is a broadcast (true dimension);
    // the per-part MIN scales with part and stays a shuffle join.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val prt = Tables.part(s, dir)
        .filter(col("p_size") === 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"))
      val eligible = partsupp(s, dir)
        .join(broadcast(supp), col("ps_suppkey") === col("s_suppkey"))
      val minCost = eligible.groupBy(col("ps_partkey").as("m_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      eligible
        .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
        .join(minCost, col("ps_partkey") === col("m_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // q11: important stock — per-part value within one nation's
    // suppliers, kept when above a scalar-subquery threshold (a
    // fraction of the nation total). Value sums stay DECIMAL until
    // the final render; the threshold is a 1-row broadcast.
    "q11_important_stock" -> ((s, dir) => {
      val nat = Tables.nation(s, dir).filter(col("n_name") === "NATION_7")
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val natPs = partsupp(s, dir)
        .join(broadcast(supp), col("ps_suppkey") === col("s_suppkey"))
      val perPart = natPs.groupBy(col("ps_partkey"))
        .agg(dsum(col("ps_value")).as("part_value"))
      val threshold = perPart
        .agg((sum(dec(col("part_value"))).cast("double") * lit(0.001))
          .as("value_floor"))
      perPart.join(broadcast(threshold))
        .filter(col("part_value") > col("value_floor"))
        .select(col("ps_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("ps_partkey"))
    }),

    // q16: supplier counts per part spec — DISTINCT suppliers per
    // (brand, type, size) bucket, anti-joining away flagged suppliers
    // (negative balance stands in for the official complaints LIKE).
    "q16_parts_supplier" -> ((s, dir) => {
      val prt = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val flagged = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      partsupp(s, dir)
        .join(broadcast(flagged), col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // q20: excess shippers — nested semi-joins: suppliers (in one
    // nation) having a ('red' part, supplier) pair whose 1996 shipped
    // quantity exceeds half its all-time quantity. The part prune
    // broadcasts; the pair-grain aggregate⨝aggregate join shuffles on
    // the composite key.
    "q20_excess_shippers" -> ((s, dir) => {
      val redParts = Tables.part(s, dir)
        .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      val qty96 = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("qty96"))
      val qualifying = partsupp(s, dir)
        .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"),
          "left_semi")
        .join(qty96, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("qty96") > lit(0.5) * col("ps_availqty"))
        .select(col("ps_suppkey"))
      val nat = Tables.nation(s, dir).filter(col("n_name") === "NATION_3")
      Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("ps_suppkey"),
          "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // q4: EXISTS semi-join — priority counts for orders with at least
    // one line shipped after the order date ("late" stands in for the
    // official commitdate<receiptdate, which the schema lacks)
    "q4_order_priority" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // q6: the forecast-revenue single-table scan — every predicate
    // pushes to the parquet reader, aggregation is one partial+final
    "q6_forecast_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // q7: volume shipping between two nations, either direction,
    // grouped by (supp_nation, cust_nation, year)
    "q7_volume_shipping" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val nat = Tables.nation(s, dir)
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      li.filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // q8: national market share — share of one supplier nation in a
    // region's ECONOMY-part import volume per year (two aliases of
    // nation: one routes customer→region, one names the supplier)
    "q8_market_share" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1995-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val prt = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .withColumn("volume",
          dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // q9: product-type profit by supplier nation and year (adapted:
    // no partsupp supplycost, so profit = discounted revenue)
    "q9_product_profit" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val prt = Tables.part(s, dir)
        .filter(col("p_name").contains("widget"))
      val nat = Tables.nation(s, dir)
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      li.join(broadcast(prt), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // q10: returned-item losers — top 20 customers by refund revenue
    "q10_returned_items" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1997-04-01"))
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // q12: shipping-priority split (l_linestatus stands in for the
    // absent l_shipmode): urgent vs non-urgent line counts per status
    "q12_priority_shipping" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      val ord = Tables.orders(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // q13: customer order-count distribution — LEFT OUTER so the
    // zero-order customers survive into the c_count=0 bucket
    "q13_order_distribution" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "5-LOW")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // q14: promo revenue share for one month — conditional aggregation
    // rendered as a percentage
    "q14_promo_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-03-01") &&
          col("l_shipdate") < ts("1997-04-01"))
      val prt = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .withColumn("volume",
          dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double")).as("promo_revenue"))
    }),

    // q15: top supplier — revenue-per-supplier CTE probed by its own
    // MAX (scalar subquery), then the supplier dimension for the name
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(revenue(col("l_extendedprice"), col("l_discount"))
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(maxRev),
          col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // q17: small-quantity-order revenue — per-part average quantity as
    // a correlated scalar (expressed as an aggregate+join, the
    // broadcast-able scale form), lines under half that average
    "q17_small_quantity" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val brandParts = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))
      val partAvg = li.join(brandParts,
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
        .select(col("l_partkey").as("t_partkey"), col("avg_qty"))
      li.join(brandParts,
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(partAvg, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // q18: large-volume customers — HAVING over a fact-key rollup,
    // then joined back through orders to the customer dimension
    "q18_large_volume" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bigOrders = li.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      bigOrders
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // q19: discounted revenue under an OR-of-ANDs predicate — the
    // whole disjunction must reach the scan as one pushed filter
    "q19_discounted_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val prt = Tables.part(s, dir)
      li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // q21: suppliers who kept waiting — the double correlated
    // EXISTS (another supplier in the order) / NOT EXISTS (no OTHER
    // supplier was late) expressed as semi+anti self-joins; "late" is
    // shipped >90 days after order date (schema lacks receipt/commit)
    "q21_waiting_suppliers" -> ((s, dir) => {
      val ordF = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val nat = Tables.nation(s, dir).filter(col("n_name") === "NATION_0")
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val late = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          timestamp_add("DAY", lit(90), col("o_orderdate")))
        .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"))
      val l1 = late.join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey"))
      val others = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"), col("l_shipdate").as("o2_ship"))
      l1.join(others,
          col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey"),
          "left_semi")
        .join(others,
          col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey") &&
            col("o2_ship") > timestamp_add("DAY", lit(90), col("o_orderdate")),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // q22: global sales opportunity — scalar-subquery threshold over
    // positive balances, anti-join against orders, grouped by country
    // code (c_nationkey % 10 stands in for the absent phone prefix)
    "q22_sales_opportunity" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .withColumn("cntrycode", (col("c_nationkey") % 10).cast("int"))
        .filter(col("cntrycode").isin(0, 1, 2, 3, 4))
      val threshold = cust.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      // "no recent orders" rather than the official "no orders ever":
      // this data's active customer base all ordered at least once, so
      // the untouched-prospect set is empty without a recency cutoff
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("2000-01-01"))
        .select(col("o_custkey"))
      cust.join(broadcast(threshold))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }),
  )

  private val disc = "(1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2))"
  private val revSql =
    s"CAST(SUM(l_extendedprice::DECIMAL(18,2) * $disc) AS DOUBLE)"

  // shared derived-partsupp CTE body (see `partsupp` scaladoc)
  private val psSql =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS ps_supplycost,
      |    CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS ps_availqty,
      |    CAST(SUM(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS ps_value
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      s"""WITH $psSql,
         |eligible AS (
         |  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |minc AS (
         |  SELECT ps_partkey AS m_partkey, MIN(ps_supplycost) AS min_cost
         |  FROM eligible GROUP BY 1)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
         |  ps_supplycost
         |FROM eligible
         |JOIN part ON ps_partkey = p_partkey
         |JOIN minc ON ps_partkey = m_partkey AND ps_supplycost = min_cost
         |WHERE p_size = 15 AND p_type = 'LARGE'
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $psSql,
         |per_part AS (
         |  SELECT ps_partkey,
         |    CAST(SUM(ps_value::DECIMAL(18,2)) AS DOUBLE) AS part_value
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7'
         |  GROUP BY 1),
         |thr AS (
         |  SELECT CAST(SUM(part_value::DECIMAL(18,2)) AS DOUBLE) * 0.001
         |    AS value_floor
         |  FROM per_part)
         |SELECT ps_partkey, part_value
         |FROM per_part, thr
         |WHERE part_value > value_floor
         |ORDER BY part_value DESC, ps_partkey""".stripMargin,

    "q16_parts_supplier" ->
      s"""WITH $psSql
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM ps
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
         |  AND ps_suppkey NOT IN (
         |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_excess_shippers" ->
      s"""WITH $psSql,
         |qty96 AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS qty96
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY 1, 2),
         |qualifying AS (
         |  SELECT ps_suppkey
         |  FROM ps
         |  JOIN qty96 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  WHERE ps_partkey IN (
         |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |    AND qty96 > 0.5 * ps_availqty)
         |SELECT s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND s_suppkey IN (SELECT ps_suppkey FROM qualifying)
         |ORDER BY s_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2)) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year, $revSql AS volume
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH all_nations AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice::DECIMAL(18,2) * (1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2)) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
        |    ELSE 0.00::DECIMAL(18,2) END) AS DOUBLE)
        |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        |FROM all_nations GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |  $revSql AS sum_profit
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE l_partkey IN (SELECT p_partkey FROM part
         |  WHERE p_name LIKE '%widget%')
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q13_order_distribution" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice::DECIMAL(18,2) * (1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
        |    ELSE 0.00::DECIMAL(18,2) END) AS DOUBLE)
        |  / CAST(SUM(l_extendedprice::DECIMAL(18,2) * (1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $revSql AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity" ->
      """SELECT CAST(SUM(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem l1
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_discounted_revenue" ->
      s"""SELECT $revSql AS revenue, count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_0'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q22_sales_opportunity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_acctbal,
        |    CAST(c_nationkey % 10 AS INT) AS cntrycode
        |  FROM customer WHERE c_nationkey % 10 IN (0,1,2,3,4)),
        |thr AS (
        |  SELECT CAST(SUM(c_acctbal::DECIMAL(18,2)) AS DOUBLE) / count(*) AS avg_bal
        |  FROM c WHERE c_acctbal > 0.0)
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(SUM(c_acctbal::DECIMAL(18,2)) AS DOUBLE) AS totacctbal
        |FROM c, thr
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
  )
}
