package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Per-consumer CDC watermark state over a small parquet directory.
  *
  * Replicates the reference's `watermarks` table semantics
  * (`/root/reference/app/services/watermark.py:7-27`): point lookup by
  * `consumer_id`, and keyed upsert (INSERT if absent, UPDATE of both
  * `last_exported_at` and `updated_at` if present).
  *
  * Plain parquet has no MERGE, so the upsert is read-modify-write with an
  * atomic directory swap: write the new state to `<dir>.tmp-<uuid>`, then
  * rename over the live dir. State is ~1 row per consumer — tiny — so a
  * full rewrite per upsert is O(consumers), not O(data). At 100 TB of
  * *source* data the watermark state stays bytes-sized; on a real cluster
  * this directory would live on an ACID table format (Delta/Iceberg
  * MERGE) or the Structured Streaming checkpoint (see
  * graft.streaming.CdcStream), which is the scale path.
  */
final class WatermarkStore(spark: SparkSession, dir: String) {

  import spark.implicits._

  private def livePath: Path = Paths.get(dir)

  /** All watermark rows (empty DataFrame with the right schema if no
    * state exists yet).
    */
  def all(): DataFrame =
    if (Files.exists(livePath))
      spark.read.schema(Schemas.watermarks).parquet(dir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], Schemas.watermarks)

  /** Point lookup (`/root/reference/app/services/watermark.py:7-9`). */
  def get(consumerId: String): Option[Timestamp] =
    all()
      .filter($"consumer_id" === consumerId)
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[Timestamp]("last_exported_at"))

  /** Keyed upsert (`/root/reference/app/services/watermark.py:11-27`):
    * insert-or-replace the row for `consumerId`, stamping `updated_at`
    * with the current time (the reference uses `datetime.now(utc)`,
    * `watermark.py:13`).
    */
  def upsert(consumerId: String, lastExportedAt: Timestamp): Unit = synchronized {
    // synchronized: the upsert is read-modify-write over the whole tiny
    // state dir, so two concurrent upserts (e.g. direct API users on
    // different threads) would otherwise lose one consumer's row. The
    // reference gets this from Postgres row locking; an ACID table
    // format provides it at cluster scale. Guards this JVM's engine
    // instance — the documented deployment (one writer per state dir).
    val now = new Timestamp(System.currentTimeMillis())
    val newRow = Seq(WatermarkRow(consumerId, lastExportedAt, now)).toDF()
    // Materialize survivors on the driver BEFORE overwriting the dir —
    // state is tiny, and reading+writing the same path in one job races.
    val survivors = all().filter($"consumer_id" =!= consumerId).collect().toSeq
    val merged = spark
      .createDataFrame(
        spark.sparkContext.parallelize(survivors, 1), Schemas.watermarks)
      .union(newRow)

    val tmp = Paths.get(dir + ".tmp-" + java.util.UUID.randomUUID())
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // Atomic-ish swap: delete live, move tmp into place. On a real
    // cluster this is a table-format transaction instead.
    deleteRecursively(livePath)
    Files.move(tmp, livePath, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
