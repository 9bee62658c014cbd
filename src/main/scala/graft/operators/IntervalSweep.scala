package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sweep-line aggregation over validity intervals: "how many intervals
  * are open on day D" computed WITHOUT exploding one row per
  * (interval × day).
  *
  * The naive form — `explode(sequence(start, end))` then
  * `groupBy(day).count()` — multiplies the input by the average span
  * length (a 2-year-open order becomes ~700 rows); at 100 TB of
  * intervals that blow-up IS the job. The sweep-line form ships two
  * ±1 delta rows per interval into a map-side-combined `groupBy(day)`,
  * so the shuffle carries at most one row per (partition × distinct
  * day) — bounded by the CALENDAR, not the data — and the open count
  * is the running total of deltas in day order (an interval [s, e]
  * contributes +1 at s and -1 at e+1, so the prefix sum at day d is
  * exactly |{i : s_i <= d <= e_i}|).
  *
  * The prefix sum itself runs through `GlobalRank.withRunningTotal`
  * sharded by `shard(day)` (any expression monotone in the day order,
  * e.g. `year(day)`) — no partitionless window even though the
  * change-day table is calendar-bounded.
  *
  * Output: one row per CHANGE DAY (a day where some interval opens or
  * closes) with the open count valid from that day until the next
  * change day. Dense per-day output is a gap-fill over the tiny
  * change-day table, not this operator's concern.
  */
object IntervalSweep {

  /** `intervals` must expose date columns `startCol` and `endCol`
    * (inclusive on both ends). Returns (day, n_open) at each change
    * day, where n_open counts intervals with start <= day <= end.
    */
  /** Weighted sweep: per change day, the COUNT of open intervals and
    * the SUM of an associative value over them (time-weighted exposure
    * — open credit, in-flight order value). Same ±delta trick with a
    * second ±value payload; both prefix sums ride one
    * `GlobalRank.withRunningTotals` pass. `value` must sum
    * associatively (integer/decimal, not raw double).
    */
  def openAggregates(intervals: DataFrame, startCol: String, endCol: String,
      value: Column, shard: Column => Column): DataFrame = {
    val deltas = intervals
      .withColumn("__val", value)
      .select(explode(array(
        struct(col(startCol).as("day"), lit(1L).as("delta"),
          col("__val").as("vdelta")),
        struct(date_add(col(endCol), 1).as("day"), lit(-1L).as("delta"),
          (-col("__val")).as("vdelta")))).as("e"))
      .select(col("e.day").as("day"), col("e.delta").as("delta"),
        col("e.vdelta").as("vdelta"))
      .groupBy(col("day"))
      .agg(sum(col("delta")).as("delta"), sum(col("vdelta")).as("vdelta"))
    GlobalRank.withRunningTotals(deltas, Seq(col("day")),
        shard(col("day")),
        Seq("n_open" -> col("delta"), "open_value" -> col("vdelta")),
        "__rn")
      .select(col("day"), col("n_open"), col("open_value"))
  }

  def openCounts(intervals: DataFrame, startCol: String, endCol: String,
      shard: Column => Column): DataFrame = {
    // one narrow explode, NOT a union of two selects: a union runs
    // the caller's interval-building lineage (often a join+agg) once
    // per branch — the .explain showed the whole spans subtree
    // duplicated. Exploding a 2-element struct array emits both
    // deltas in a single pass.
    val deltas = intervals
      .select(explode(array(
        struct(col(startCol).as("day"), lit(1L).as("delta")),
        struct(date_add(col(endCol), 1).as("day"),
          lit(-1L).as("delta")))).as("e"))
      .select(col("e.day").as("day"), col("e.delta").as("delta"))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    GlobalRank.withRunningTotal(deltas, Seq(col("day")),
        shard(col("day")), col("delta"), "__rn", "n_open")
      .select(col("day"), col("n_open"))
  }
}
