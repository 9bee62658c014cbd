package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.cdc.AggView

/** Streaming incremental materialized view: each micro-batch's
  * per-key partials fold into the maintained aggregate table via
  * [[AggView.merge]], with foreachBatch's batch id as the
  * exactly-once fence — a replayed batch (at-least-once delivery
  * after a failure) presents the same id and is skipped, so the
  * additive merge never double-counts.
  */
object StreamingAggView {

  def aggStream(stream: DataFrame, tableDir: String)
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        AggView.merge(batch.sparkSession, tableDir, batch.toDF(), batchId)
        ()
      }
}
