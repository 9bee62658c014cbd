package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto-optimal set): the rows not dominated by
  * any other row, where q dominates p iff q is <= p on every criterion
  * and < on at least one (criteria are normalized to MINIMIZE below —
  * a maximized column is negated).
  *
  * The definitional form is an O(n²) dominance anti-join — fine as an
  * oracle, fatal at scale. The distributed shape here is the classic
  * grid prune (Börzsönyi et al., "The Skyline Operator", ICDE 2001
  * lineage): bucket every row into a G-per-dimension grid cell, and
  * drop ALL rows of any cell strictly dominated at cell granularity
  * (cellA[d] + 1 <= cellB[d] on every dimension means every point of A
  * dominates every point of B — the +1 gap absorbs within-cell value
  * spread). Dominance is transitive and cell-dominance is a strict
  * partial order, so a pruned row's dominator chain always terminates
  * at a SURVIVING row: comparing survivors only against survivors
  * still yields the exact global skyline.
  *
  * Scale shape: the grid pass is one agg for (min, max) per dimension
  * plus a distinct over <= G^dims cells (both map-side combined); the
  * cell-dominance anti-join runs on the tiny cell list (broadcast);
  * the exact pass is a broadcast anti-join of survivors against
  * survivors — quadratic only in the PRUNED candidate count, which for
  * anti-correlated-at-worst data is the skyline band, not n. G trades
  * prune power against cell-list size.
  */
object Skyline {

  /** Skyline of `df` minimizing every column in `minimize` (negate a
    * column to maximize it). Values must be non-null, non-NaN
    * numerics (engines order NaN differently — Spark comparisons
    * return false, so a NaN row would survive as a spurious skyline
    * member); ties are kept (identical rows don't dominate each
    * other).
    */
  def of(df: DataFrame, minimize: Seq[Column], grid: Int = 64): DataFrame = {
    require(minimize.nonEmpty && grid >= 2)
    val dims = minimize.indices
    val vals = df.select(
      (df.columns.map(col) ++ dims.map(i =>
        minimize(i).cast("double").as(s"__v$i"))): _*)

    // one tiny (min, max) row per dimension, broadcast back — grid
    // geometry only affects PRUNE POWER, never correctness, so double
    // arithmetic here is safe even when the values themselves are not
    // exactly representable
    val boundExprs = dims.flatMap(i => Seq(
      min(col(s"__v$i")).as(s"__lo$i"),
      max(col(s"__v$i")).as(s"__hi$i")))
    val bounds = vals.agg(boundExprs.head, boundExprs.tail: _*)

    def cell(i: Int): Column = {
      val span = col(s"__hi$i") - col(s"__lo$i")
      least(greatest(when(span > 0,
        floor((col(s"__v$i") - col(s"__lo$i")) / span * grid))
        .otherwise(lit(0)), lit(0)), lit(grid - 1)).cast("int")
    }
    val celled = vals.crossJoin(broadcast(bounds))
      .select((vals.columns.map(col) ++ dims.map(i =>
        cell(i).as(s"__c$i"))): _*)

    val cells = celled.select(dims.map(i => col(s"__c$i")): _*).distinct()
    val cellsB = cells.select(dims.map(i =>
      col(s"__c$i").as(s"__d$i")): _*)
    val cellDominated = dims.map(i =>
      col(s"__d$i") + lit(1) <= col(s"__c$i")).reduce(_ && _)
    val liveCells = cells.join(broadcast(cellsB), cellDominated, "left_anti")

    val survivors = celled.join(broadcast(liveCells),
        dims.map(i => s"__c$i"), "left_semi")
      .drop(dims.map(i => s"__c$i"): _*)

    // exact dominance among survivors: q <= p everywhere AND < somewhere
    val q = survivors.select(dims.map(i =>
      col(s"__v$i").as(s"__q$i")): _*)
    val dominated =
      dims.map(i => col(s"__q$i") <= col(s"__v$i")).reduce(_ && _) &&
        dims.map(i => col(s"__q$i") < col(s"__v$i")).reduce(_ || _)
    survivors.join(broadcast(q), dominated, "left_anti")
      .drop(dims.map(i => s"__v$i"): _*)
  }
}
