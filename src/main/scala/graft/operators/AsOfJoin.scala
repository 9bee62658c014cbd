package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest
  * right row with `rightTime <= leftTime`, per key — the temporal
  * lookup CDC/attribution pipelines need (latest dimension version,
  * last event before).
  *
  * Spark has no native as-of join; the preference-order choice here is
  * (a) compose built-ins: tag both sides, union, and take a running
  * `last(ignoreNulls)` over a (key, time, side) window. Cost = ONE
  * shuffle on the key + a per-partition sort — same as a sort-merge
  * join, with none of the O(n·m) range-join blowup of the naive
  * `leftTime >= rightTime` theta join. At 100 TB both sides
  * shuffle-partition by key and stream through the window operator.
  *
  * Right rows tie-break by `rightTime` then right row order: sides sort
  * (side=0 right before side=1 left) so a right row exactly at
  * `leftTime` IS eligible (inclusive semantics, matching DuckDB
  * `ASOF JOIN ... ON l.t >= r.t`).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param by         equi-key column names present on both sides
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightCols  right columns to carry (renamed as-is on output,
    *                   null when no right row precedes the left row)
    * @param maxGap     optional lookback/lookahead bound (pandas
    *                   merge_asof `tolerance`): matches farther than
    *                   this are nulled. A Column so it works for any
    *                   time type — `expr("INTERVAL '30' MINUTE")` for
    *                   timestamps, a numeric literal for long/epoch
    *                   columns
    * @param forward    false (default): latest right at-or-BEFORE each
    *                   left row; true: earliest right at-or-AFTER it
    *                   (merge_asof direction='forward') — the same
    *                   one-shuffle window scanned in reverse time order
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      maxGap: Option[org.apache.spark.sql.Column] = None,
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      by.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(right.select(rightCols.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (st, f) => st.add(f))).as("__r"): _*)
    val r = right.select(
      by.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    // backward: ascending time scan, "last right seen so far" = latest
    // at-or-before. forward: the SAME running-last over a descending
    // scan = earliest at-or-after. Side order (right before left at
    // equal times) keeps the bound inclusive in both directions.
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(timeOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    val bounded = maxGap match {
      case None => matched
      case Some(g) =>
        // matched right time rides the same running-last; matches
        // farther than the gap are nulled (null gap stays null)
        val gap =
          if (forward) col("__match_t") - col("__t")
          else col("__t") - col("__match_t")
        matched
          .withColumn("__match_t",
            last(when(col("__side") === 0, col("__t")),
              ignoreNulls = true).over(w))
          .withColumn("__match", when(gap <= g, col("__match")))
    }
    bounded
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        rightCols.map(c => col(s"__match.$c")): _*)
  }

  /** merge_asof direction='nearest': the right row with the smallest
    * absolute time distance (ties to the earlier row, matching pandas).
    * Both directional running-lasts share the one shuffle on the key —
    * two window sorts over the same partitioning, no extra exchange.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      by.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(right.select(rightCols.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (st, f) => st.add(f))).as("__r"): _*)
    val r = right.select(
      by.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    val back = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rightT = when(col("__side") === 0, col("__t"))
    l.unionByName(r)
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(back))
      .withColumn("__mbt", last(rightT, ignoreNulls = true).over(back))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(fwd))
      .withColumn("__mft", last(rightT, ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
      // nearest with earlier-on-tie: backward wins when its gap is <=
      // the forward gap; a missing side loses automatically via null
      .withColumn("__match",
        when(col("__mf").isNull, col("__mb"))
          .when(col("__mb").isNull, col("__mf"))
          .when(col("__t") - col("__mbt") <= col("__mft") - col("__t"),
            col("__mb"))
          .otherwise(col("__mf")))
      .select(leftCols.map(c => col(s"__l.$c")) ++
        rightCols.map(c => col(s"__match.$c")): _*)
  }
}
