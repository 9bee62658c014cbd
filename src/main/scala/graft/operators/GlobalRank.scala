package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row_number: the scale-safe replacement for
  * `Window.orderBy(...)` with no partition key, which funnels the whole
  * table through ONE task's sort (the classic global-rank trap — fine at
  * 60k rows, fatal at 100 TB).
  *
  * Strategy: shard by any expression MONOTONE in the global order
  * (a value-range band, a hex prefix of an ordering hash — anything
  * where shard(a) <= shard(b) whenever a precedes b globally), rank
  * each shard locally in parallel, then chain the per-shard counts into
  * offsets with one window over the tiny shard list. Rank = offset +
  * local rank. Three jobs, no global sort, and the offsets table is
  * |shards| rows regardless of data size.
  *
  * Shard BALANCE only affects parallelism, never correctness — callers
  * can derive range boundaries from `approx_percentile` samples and the
  * ranks stay exact.
  */
object GlobalRank {

  /** `df` plus `rankCol` = 1-based global row_number over
    * (`orderCols`..., tie-broken by the caller including a unique
    * column last). `shard` must be monotone w.r.t. that order.
    */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column], shard: Column,
      rankCol: String = "global_rn"): DataFrame = {
    val sharded = df.withColumn("__shard", shard)
    val localW = Window.partitionBy(col("__shard")).orderBy(orderCols: _*)
    val local = sharded.withColumn("__local_rn",
      row_number().over(localW).cast("long"))
    // per-shard counts -> exclusive prefix sums; the window here runs
    // over |shards| rows, not the data
    val offsetW = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(offsetW), lit(0L)))
      .select(col("__shard"), col("__offset"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(rankCol, col("__offset") + col("__local_rn"))
      .drop("__shard", "__local_rn", "__offset")
  }

  /** `df` plus `rankCol` AND `sumCol` = 1-based global row_number and
    * the inclusive running total of `value` over the same global order
    * — the distributed cumulative-sum every quota/Pareto/mixing stage
    * needs, again without a partitionless window: per-shard running
    * totals in parallel, per-shard value sums chained into offsets.
    * `value` should be an exact type (DECIMAL/integer) so the running
    * total is associative across the shard recombination.
    */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], shard: Column,
      value: Column, rankCol: String = "global_rn",
      sumCol: String = "running_total"): DataFrame = {
    val sharded = df.withColumn("__shard", shard).withColumn("__v", value)
    val localW = Window.partitionBy(col("__shard")).orderBy(orderCols: _*)
    val local = sharded
      .withColumn("__local_rn", row_number().over(localW).cast("long"))
      .withColumn("__local_sum", sum(col("__v")).over(localW))
    val offsetW = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(offsetW), lit(0L)))
      .withColumn("__sum_offset", sum(col("__s")).over(offsetW))
      .select(col("__shard"), col("__offset"), col("__sum_offset"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(rankCol, col("__offset") + col("__local_rn"))
      .withColumn(sumCol,
        when(col("__sum_offset").isNull, col("__local_sum"))
          .otherwise(col("__sum_offset") + col("__local_sum")))
      .drop("__shard", "__v", "__local_rn", "__local_sum",
        "__offset", "__sum_offset")
  }

  /** Multi-value form of [[withRunningTotal]]: N running totals in the
    * same three jobs (one local window pass, one |shards|-row offsets
    * table, one broadcast join) instead of N invocations = N shuffles.
    * `values` maps output column name -> summed expression; sums must
    * be associative (integers / decimals — not raw doubles).
    */
  def withRunningTotals(df: DataFrame, orderCols: Seq[Column], shard: Column,
      values: Seq[(String, Column)],
      rankCol: String = "global_rn"): DataFrame = {
    require(values.nonEmpty)
    val vcols = values.indices.map(i => s"__v$i")
    val sharded = values.zipWithIndex.foldLeft(df.withColumn("__shard", shard)) {
      case (acc, ((_, v), i)) => acc.withColumn(s"__v$i", v)
    }
    val localW = Window.partitionBy(col("__shard")).orderBy(orderCols: _*)
    val local = values.indices.foldLeft(
      sharded.withColumn("__local_rn", row_number().over(localW).cast("long"))) {
      case (acc, i) =>
        acc.withColumn(s"__ls$i", sum(col(s"__v$i")).over(localW))
    }
    val offsetW = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs = count(lit(1)).as("__n") +:
      values.indices.map(i => sum(col(s"__v$i")).as(s"__s$i"))
    val offsets = values.indices.foldLeft(
      sharded.groupBy(col("__shard")).agg(aggs.head, aggs.tail: _*)
        .withColumn("__offset",
          coalesce(sum(col("__n")).over(offsetW), lit(0L)))) {
      case (acc, i) =>
        acc.withColumn(s"__so$i", sum(col(s"__s$i")).over(offsetW))
    }.select((col("__shard") +: col("__offset") +:
      values.indices.map(i => col(s"__so$i"))): _*)
    val joined = local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(rankCol, col("__offset") + col("__local_rn"))
    values.zipWithIndex.foldLeft(joined) {
      case (acc, ((name, _), i)) =>
        acc.withColumn(name,
          when(col(s"__so$i").isNull, col(s"__ls$i"))
            .otherwise(col(s"__so$i") + col(s"__ls$i")))
    }.drop(("__shard" +: "__offset" +: "__local_rn" +:
      (vcols ++ values.indices.flatMap(i => Seq(s"__ls$i", s"__so$i")))): _*)
  }

  /** A monotone range-band shard expression from explicit boundaries:
    * shard = number of boundaries strictly below the value. Rows tied
    * on a boundary land in one shard, preserving monotonicity.
    */
  def rangeShard(value: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + (value > lit(b)).cast("int")
    }

  /** SQL ntile(k) from a global rank and total count — the exact
    * engine formula: the first (n % k) buckets take ⌈n/k⌉ rows, the
    * rest ⌊n/k⌋. Requires n >= 1; k >= 1.
    */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    // `/` is double division; floor+cast is exact here because every
    // quotient that matters is a ratio of int64s whose target integer
    // part is <= k+1 — far inside double's correctly-rounded range
    val q = floor(n / lit(k)).cast("long")
    val r = (n % lit(k)).cast("long")
    val cut = r * (q + lit(1L))
    when(rank <= cut, floor((rank - lit(1L)) / (q + lit(1L))).cast("long"))
      .otherwise(r +
        floor((rank - lit(1L) - cut) / greatest(q, lit(1L))).cast("long")) +
      lit(1L)
  }
}
