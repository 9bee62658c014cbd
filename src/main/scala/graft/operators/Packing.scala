package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-token-budget training sequences by the standard
  * concat-and-chunk scheme — documents in a stable order, running
  * token offsets, sequence id = offset ÷ budget.
  *
  * Scale design: a single global ordering would serialize the window
  * into one partition, so packing is SHARDED — documents hash into
  * `shards` independent streams, each packed by its own window
  * (partitionBy(shard) = parallel state, one shuffle). Packing quality
  * is unaffected: sequences never span shards, and each shard wastes
  * at most one partial tail sequence. Integer arithmetic throughout,
  * so results are exactly reproducible (and DuckDB-oracle-checkable).
  */
object Packing {

  /** @param budget max tokens per packed sequence (docs longer than
    *               the budget occupy ceil(n/budget) sequences' worth of
    *               ids on their own)
    * @return input columns + (shard, seq_id, seq_offset)
    */
  def packSequences(docs: DataFrame, tokenCol: String, idCol: String,
      budget: Long, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .withColumn("seq_offset", col("cum_tokens") - col(tokenCol))
      .withColumn("seq_id",
        col("shard") * lit(1000000L) + (col("seq_offset") / budget).cast("long"))
      .drop("cum_tokens")
  }
}
