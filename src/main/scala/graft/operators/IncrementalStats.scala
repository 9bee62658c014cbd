package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus-statistics maintenance via ALGEBRAIC partial
  * aggregates: per-key (count, sum, min, max, sum-of-squares) partials
  * computed per batch, merged associatively into the running state.
  * This is how corpus-level stats stay current at 100 TB — each new
  * ingest batch contributes a partial the size of the key domain, and
  * the merge never rescans history. Mean/variance derive from the
  * merged partials at read time.
  *
  * The merge is exactly Spark's own partial-aggregation algebra lifted
  * to a persistable table, so merged state is provably identical to a
  * full recompute (spec + oracle assert this).
  */
object IncrementalStats {

  /** Per-key partial state of `valCol`: n / sum / min / max / sumsq. */
  def partials(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(v).as("sum"),
        min(v).as("min"), max(v).as("max"),
        sum(v * v).as("sumsq"))
  }

  /** Associative merge of partial-state tables (same schema). */
  def merge(states: DataFrame*): DataFrame = {
    val all = states.reduce(_ unionByName _)
    val key = all.columns.head
    all.groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("sum")).as("sum"),
        min(col("min")).as("min"), max(col("max")).as("max"),
        sum(col("sumsq")).as("sumsq"))
  }

  /** Derived stats (mean; population variance via sumsq) from state. */
  def finalize(state: DataFrame): DataFrame =
    state.withColumn("mean", col("sum").cast("double") / col("n"))
      .withColumn("variance",
        col("sumsq").cast("double") / col("n") -
          (col("sum").cast("double") / col("n")) *
          (col("sum").cast("double") / col("n")))
}
