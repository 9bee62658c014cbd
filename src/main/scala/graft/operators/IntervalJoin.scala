package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucketed interval join: pairs (left, right) sharing keys with
  * |leftTime − rightTime| ≤ tolerance.
  *
  * The naive formulation — a θ-join on the time-range predicate — plans
  * as a broadcast nested-loop join: O(|L|·|R|) comparisons, the classic
  * range-join trap (see also dedup_jaccard_pairs). The scalable shape
  * buckets time into tolerance-width cells: a qualifying pair's cells
  * differ by at most 1, so probing each left row against cells
  * {b−1, b, b+1} via an exploded equi-join on (keys, cell) finds every
  * pair, and the exact |Δt| filter runs only on same-cell candidates.
  * One shuffle on (keys, cell); candidate count is data-proportional,
  * not quadratic.
  */
object IntervalJoin {

  /** @param toleranceSec window half-width in whole seconds; times
    *                     compare on floor-seconds (exact integer math)
    */
  def timeBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, toleranceSec: Long): DataFrame = {
    val l = left
      .withColumn("__lsec", unix_timestamp(col(leftTime)))
      .withColumn("__cell",
        explode(array(Seq(-1, 0, 1).map(d =>
          expr(s"(unix_timestamp($leftTime) div $toleranceSec) + $d")): _*)))
    val r = right
      .withColumn("__rsec", unix_timestamp(col(rightTime)))
      .withColumn("__cell", expr(s"unix_timestamp($rightTime) div $toleranceSec"))
    l.join(r, keys :+ "__cell")
      .filter(abs(col("__lsec") - col("__rsec")) <= toleranceSec)
      .drop("__cell", "__lsec", "__rsec")
  }
}
