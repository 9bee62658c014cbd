package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.DetSketch

/** Streaming distinct-count: each micro-batch folds into the
  * maintained HLL register state ([[DetSketch.mergeHllState]]) — a
  * constant-size (<= 2^p rows) table that answers "how many distinct
  * keys ever" at any point in the stream's life.
  *
  * Register merge is idempotent and commutative (pointwise max), so a
  * replayed batch (foreachBatch is at-least-once after a failure)
  * cannot corrupt the state — the streaming analog of the batch
  * sketch's partition invariance, and the reason no transactional
  * sink is needed. `DetSketch.initHllState` must have created
  * `stateDir` first (an empty first batch is fine).
  */
object StreamingSketch {

  def hllStream(stream: DataFrame, keyCol: String, stateDir: String)
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        DetSketch.mergeHllState(batch.sparkSession, stateDir,
          batch.toDF(), keyCol)
        ()
      }

  /** Streaming heavy hitters: per-batch Misra-Gries fold into the
    * maintained <= m-row state ([[graft.operators.HeavyHitters
    * .mergeMgState]]). The superset guarantee (every key above
    * n/(m+1) retained) holds over everything ever streamed; unlike
    * the HLL fold the merge is monotone but NOT idempotent, so an
    * at-least-once replay inflates counts — never drops a heavy
    * hitter (see the operator scaladoc for the exact semantics).
    */
  def heavyHittersStream(stream: DataFrame, keyCol: String,
      stateDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.HeavyHitters.mergeMgState(batch.sparkSession,
          stateDir, batch.toDF(), keyCol)
        ()
      }
}
