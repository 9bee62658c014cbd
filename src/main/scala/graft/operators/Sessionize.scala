package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: consecutive events of a key belong to one
  * session until a gap longer than `gapSec` separates them — the
  * classic web-analytics / user-journey segmentation.
  *
  * One shuffle on the key; the session index is a running sum of
  * new-session flags over the same window, so assignment streams
  * through a single per-partition sort. Deterministic given a unique
  * tiebreaker column.
  */
object Sessionize {

  /** Input columns + (session_idx, is_session_start). `session_idx` is
    * 1-based per key in time order.
    */
  def assign(df: DataFrame, keyCol: String, tsSecCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsSecCol), col(tieCol))
    val newSession: Column =
      when(lag(col(tsSecCol), 1).over(w).isNull ||
        col(tsSecCol) - lag(col(tsSecCol), 1).over(w) > gapSec, 1L)
        .otherwise(0L)
    df.withColumn("is_session_start", newSession === 1L)
      .withColumn("session_idx",
        sum(newSession).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
