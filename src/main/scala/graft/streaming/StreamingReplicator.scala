package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{DataType, StringType, StructType}

import graft.cdc.{Replicator, TxLog}

/** Continuous feed-driven replication: the closed CDC chain
  * ([[graft.cdc.Replicator]] — source merge → change feed → replica
  * merge with a TxLog-committed consumer offset) run as a Structured
  * Streaming job instead of a polling loop.
  *
  * The stream rides [[FeedBatchSource]] — a DataSource-v2 micro-batch
  * source whose OFFSETS are the feed batch ids themselves, so progress
  * is checkpointed and resumed by the engine with real per-batch
  * semantics, and `maxBatchesPerTrigger` bounds how far one
  * micro-batch may advance (backpressure for a replica catching up
  * after downtime). What to apply is still decided by the replica's
  * own offset, not the stream slice: `Replicator.sync` re-resolves
  * `[offset+1, head]` and applies it in one partition-pruned merge,
  * which makes the job indifferent to micro-batch/feed-batch alignment
  * and idempotent under foreachBatch replay (the offset fence and the
  * merge's (key, version) semantics already guarantee convergence —
  * the streaming layer adds scheduling, not new state).
  */
object StreamingReplicator {

  /** The feed's read schema: the source table's committed schema plus
    * the `_change_type` discriminator (the `batch` partition column is
    * excluded by the `batch=*` glob, exactly like a batch feed read).
    */
  def feedSchema(spark: SparkSession, sourceDir: String): StructType = {
    val snap = TxLog.latest(spark, sourceDir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed manifest under $sourceDir"))
    DataType.fromJson(snap.props("schema_json")).asInstanceOf[StructType]
      .add("_change_type", StringType)
  }

  /** A writer that keeps `replicaDir` (created by `Replicator.init`)
    * in sync with `sourceDir`'s feed. Attach a trigger + checkpoint
    * and `.start()`. `maxBatchesPerTrigger` caps how many feed batches
    * one micro-batch admits (0 = unbounded).
    */
  def replicaStream(spark: SparkSession, sourceDir: String,
      replicaDir: String, maxBatchesPerTrigger: Long = 0L)
      : DataStreamWriter[Row] = {
    val reader = spark.readStream
      .format(classOf[FeedBatchSource].getName)
      .option("path", sourceDir)
    val limited = if (maxBatchesPerTrigger > 0L)
      reader.option("maxBatchesPerTrigger", maxBatchesPerTrigger.toString)
    else reader
    limited.load()
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // bound APPLIED work by the admitted slice: sync only up to
        // the highest feed batch id this micro-batch admitted, so
        // maxBatchesPerTrigger limits merge size per trigger instead
        // of the first micro-batch draining the whole backlog and the
        // rest being no-ops (the admitted ids are ≤ a handful of longs
        // — a metadata-sized collect)
        val admitted = batch.agg(
          org.apache.spark.sql.functions.max("batch")).collect()
        val upTo = if (admitted.isEmpty || admitted(0).isNullAt(0))
          None else Some(admitted(0).getLong(0))
        upTo.foreach(hi =>
          Replicator.sync(batch.sparkSession, sourceDir, replicaDir,
            upTo = hi))
        ()
      }
  }
}
