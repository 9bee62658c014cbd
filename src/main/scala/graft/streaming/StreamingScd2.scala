package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.cdc.Scd2

/** Continuous SCD2 maintenance: each micro-batch of an unbounded
  * changelog applies to the maintained history table through
  * [[graft.cdc.Scd2.merge]] — CDC consumed into an auditable,
  * time-travelable history instead of a mutable snapshot, with the
  * batch operator's guarantees carried over unchanged: only buckets
  * containing the batch's keys are read or rewritten, late changes
  * splice exactly (the whole changed key re-windows), and a replayed
  * batch (foreachBatch is at-least-once after a failure) deduplicates
  * on (key, version), so the history converges exactly-once without a
  * transactional sink.
  *
  * Caller sets trigger/checkpoint on the returned writer and starts it;
  * `Scd2.init` must have created `tableDir` first.
  */
object StreamingScd2 {

  def historyStream(changelog: DataFrame, tableDir: String)
      : DataStreamWriter[Row] =
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Scd2.merge(batch.sparkSession, tableDir, batch.toDF())
        ()
      }
}
