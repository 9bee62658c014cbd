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

  /** `mergeOnRead = true` makes every micro-batch an O(batch) delta
    * write (the scattered-update fast path); `maintainEvery = N > 0`
    * runs [[Compaction.maintain]] after every Nth micro-batch so
    * delta chains fold before read amplification accumulates — the
    * cadence-driven compaction an unattended streaming table needs.
    * The maintenance check is manifest-only when nothing qualifies,
    * so a tight cadence costs metadata, not jobs.
    */
  def mergeStream(changelog: DataFrame, tableDir: String,
      mergeOnRead: Boolean = false, maintainEvery: Int = 0,
      maxDeltasPerBucket: Int = 8,
      maxHistoryAge: java.time.Duration = null)
      : DataStreamWriter[Row] = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Compaction.merge(batch.sparkSession, tableDir, batch.toDF(),
          mergeOnRead = mergeOnRead)
        if (maintainEvery > 0 &&
            batches.incrementAndGet() % maintainEvery == 0) {
          Compaction.maintain(batch.sparkSession, tableDir,
            maxDeltasPerBucket, maxHistoryAge)
          ()
        }
        ()
      }
  }
}
