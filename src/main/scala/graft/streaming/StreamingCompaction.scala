package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.cdc.Compaction

/** Continuous keyed MERGE: each micro-batch of an unbounded changelog
  * applies to the maintained compacted table through
  * [[graft.cdc.Compaction.merge]] — the streaming face of the
  * reference's upsert loop (poll, apply `ON CONFLICT`, advance), with
  * the batch operator's guarantees carried over unchanged: only
  * partitions containing the batch's keys are read or rewritten, and a
  * replayed batch (foreachBatch is at-least-once after a failure)
  * merges idempotently — same versions, same winners, same files'
  * content — so the table converges exactly-once without a
  * transactional sink.
  *
  * Caller sets trigger/checkpoint on the returned writer and starts it;
  * `Compaction.init` must have created `tableDir` first.
  */
object StreamingCompaction {

  def mergeStream(changelog: DataFrame, tableDir: String)
      : DataStreamWriter[Row] =
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Compaction.merge(batch.sparkSession, tableDir, batch.toDF())
        ()
      }
}
