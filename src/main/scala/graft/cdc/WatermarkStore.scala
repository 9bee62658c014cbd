package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Per-consumer CDC watermark state on the [[TxLog]] manifest.
  *
  * Replicates the reference's `watermarks` table semantics
  * (`/root/reference/app/services/watermark.py:7-27`): point lookup by
  * `consumer_id`, and keyed upsert (INSERT if absent, UPDATE of both
  * `last_exported_at` and `updated_at` if present).
  *
  * State is ~1 row per consumer — bytes — so the rows live directly in
  * the manifest properties: an upsert is read-latest → modify → commit
  * v+1, where the commit rename REFUSES to overwrite an existing
  * version. Two writers racing — different threads, or different
  * PROCESSES sharing the state dir — conflict deterministically and
  * the loser retries against the fresh state (optimistic CAS), so no
  * consumer's advance can be silently lost the way the previous
  * last-rename-wins directory swap could lose one (r4 advisory). The
  * reference gets the same guarantee from Postgres row locking; an
  * ACID table format provides it at cluster scale. Zero Spark jobs on
  * either path: lookups read one properties file, upserts write one.
  */
final class WatermarkStore(spark: SparkSession, dir: String) {

  private val Prefix = "wm."
  private val MaxCasRetries = 50

  // sub-second precision survives the round trip: epoch seconds plus
  // the FULL nanos field (source `updated_at` values carry micros)
  private def enc(t: Timestamp): String = s"${t.getTime / 1000}:${t.getNanos}"

  private def dec(s: String): Timestamp = {
    val Array(sec, nanos) = s.split(":")
    val t = new Timestamp(sec.toLong * 1000L)
    t.setNanos(nanos.toInt)
    t
  }

  private def rowsOf(snap: TxLog.Snapshot): Seq[WatermarkRow] =
    snap.props.toSeq.collect {
      case (k, v) if k.startsWith(Prefix) =>
        val Array(last, upd) = v.split(",")
        WatermarkRow(k.drop(Prefix.length), dec(last), dec(upd))
    }.sortBy(_.consumer_id)

  /** All watermark rows (empty DataFrame with the right schema if no
    * state exists yet).
    */
  def all(): DataFrame = {
    val rows = TxLog.latest(spark, dir).map(rowsOf).getOrElse(Nil)
      .map(r => Row(r.consumer_id, r.last_exported_at, r.updated_at))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.watermarks)
  }

  /** Point lookup (`/root/reference/app/services/watermark.py:7-9`) —
    * one driver-side file read, no Spark job.
    */
  def get(consumerId: String): Option[Timestamp] =
    TxLog.latest(spark, dir)
      .flatMap(_.prop(Prefix + consumerId))
      .map(v => dec(v.split(",")(0)))

  /** Keyed upsert (`/root/reference/app/services/watermark.py:11-27`):
    * insert-or-replace the row for `consumerId`, stamping `updated_at`
    * with the current time (the reference uses `datetime.now(utc)`,
    * `watermark.py:13`). CAS-retried; `synchronized` additionally
    * serializes same-instance threads so in-process contention doesn't
    * burn retries.
    */
  def upsert(consumerId: String, lastExportedAt: Timestamp): Unit = synchronized {
    val now = new Timestamp(System.currentTimeMillis())
    var attempt = 0
    while (attempt < MaxCasRetries) {
      val snap = TxLog.latest(spark, dir)
      val version = snap.map(_.version + 1L).getOrElse(0L)
      val kept = snap.map(_.props.filter(_._1.startsWith(Prefix)))
        .getOrElse(Map.empty)
      val props = kept + (Prefix + consumerId ->
        s"${enc(lastExportedAt)},${enc(now)}")
      try {
        TxLog.commit(spark, dir, version, props)
        // keep only the latest version: watermark state needs no
        // time travel, and the manifest dir must stay O(1) files
        TxLog.vacuum(spark, dir, version)
        return
      } catch {
        case _: IllegalStateException => attempt += 1 // lost the race
      }
    }
    throw new IllegalStateException(
      s"watermark upsert for $consumerId lost $MaxCasRetries CAS races")
  }
}
