package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful cross-batch deduplication for streams: emit each key's row
  * the FIRST time it is seen across all micro-batches, suppressing
  * every later duplicate — the streaming counterpart of
  * `dropDuplicates` over an unbounded changelog (e.g. replayed CDC
  * files, at-least-once upstreams).
  *
  * Built on `KeyValueGroupedDataset.flatMapGroupsWithState`: state is
  * one boolean per key, partitioned by the state-store shuffle. At
  * scale, state GC is the design constraint — `ProcessingTimeTimeout`
  * with `stateTtl` evicts keys not seen within the TTL, bounding the
  * store to the active-key working set (an exact dedup over 100 TB of
  * history would otherwise grow state without limit).
  */
object StreamingDedup {

  final case class Seen(firstSeenMs: Long)

  /** Deduplicate a (possibly streaming) Dataset by `key`, keeping the
    * first row per key; state entries expire `stateTtlMs` after last
    * touch (0 = never).
    *
    * TTL caveat: processing-time timeouts fire when a subsequent
    * micro-batch executes — the natural fit is a continuously-running
    * query (the deployment where state GC matters). Under one-shot
    * `Trigger.AvailableNow` drains, pending timeouts can hold the query
    * past its drained data; use `stateTtlMs = 0` for drain-style jobs
    * and let the checkpoint scope the state lifetime instead.
    */
  def firstPerKey[T](ds: Dataset[T], key: T => String,
      stateTtlMs: Long = 0L): Dataset[T] = {
    import ds.sparkSession.implicits._
    implicit val enc = ds.encoder
    ds.groupByKey(key)
      .flatMapGroupsWithState[Seen, T](
        OutputMode.Append,
        if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[T], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator.empty // duplicates suppressed
          } else {
            state.update(Seen(System.currentTimeMillis()))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            rows.take(1)
          }
      }
  }
}
