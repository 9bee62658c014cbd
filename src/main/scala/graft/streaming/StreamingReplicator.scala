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
  * The file stream over the source's `feed/` directory is the WAKE-UP
  * SIGNAL — a published feed batch appears as new files atomically
  * (the publish is one directory rename), so each micro-batch fires
  * exactly when there is something to apply. What to apply is decided
  * by the replica's own offset, not by the stream's file slice:
  * `Replicator.sync` re-resolves `[offset+1, head]` and applies it in
  * one partition-pruned merge, which makes the job indifferent to
  * micro-batch/feed-batch alignment and idempotent under foreachBatch
  * replay (both the offset fence and the merge's (key, version)
  * semantics already guarantee convergence — the streaming layer adds
  * scheduling, not new state).
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
    * and `.start()`.
    */
  def replicaStream(spark: SparkSession, sourceDir: String,
      replicaDir: String): DataStreamWriter[Row] =
    spark.readStream
      .schema(feedSchema(spark, sourceDir))
      .parquet(s"$sourceDir/feed/batch=*")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Replicator.sync(batch.sparkSession, sourceDir, replicaDir)
        ()
      }
}
