package graft.cdc

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

/** Factory entry points for the supported `users` sources. */
object CdcEngine {

  /** Live-database source via JDBC — the direct analog of the
    * reference reading Postgres (`/root/reference/app/database.py`).
    * The watermark predicate composed on top of this DataFrame pushes
    * down into the remote SQL (Catalyst JDBC filter pushdown), so an
    * incremental export ships `WHERE updated_at > ?` to the database
    * exactly as the reference does — served there by the
    * `idx_users_updated_at` index.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      connectionProperties: java.util.Properties, watermarkDir: String,
      outputDir: String): CdcEngine =
    new CdcEngine(spark,
      () => spark.read.jdbc(url, table, connectionProperties),
      watermarkDir, outputDir)
}

/** The engine's public API surface, mirroring the reference's five
  * endpoints (`/root/reference/app/main.py:17-107`, SURVEY.md §2.11):
  * full / incremental / delta export + watermark lookup, each returning
  * job metadata (`ExportJobResponse`, `app/schemas.py:11-15`).
  *
  * Semantics preserved exactly (SURVEY.md §3):
  *  - full: WHERE NOT is_deleted ORDER BY updated_at
  *  - incremental: AND updated_at > watermark (strict); missing
  *    watermark ⇒ export nothing, write no file, create no watermark
  *    (`app/services/exports.py:110-113`)
  *  - delta: updated_at > watermark, soft-deletes INCLUDED, prepended
  *    3-way `operation` column (`app/services/exports.py:138-171`)
  *  - empty result ⇒ rowsExported=0, NO file written, watermark untouched
  *    (`app/services/exports.py:87-88,127-128,163-164`)
  *  - watermark advances to max(updated_at) of the exported batch, only
  *    after the CSV write succeeds (transactional ordering of
  *    `app/services/jobs.py:31-60`)
  *
  * @param usersSource supplier of the `users` table (parquet snapshot
  *                     dir, JDBC to a live Postgres, or any DataFrame —
  *                     re-evaluated per export so each job sees the
  *                     current table state)
  * @param watermarkDir parquet state dir for the `watermarks` table
  * @param outputDir   directory for CSV export artifacts
  */
final class CdcEngine(
    spark: SparkSession,
    usersSource: () => DataFrame,
    watermarkDir: String,
    outputDir: String,
) {

  /** Parquet-snapshot source (testdata / lakehouse layout). */
  def this(spark: SparkSession, usersPath: String, watermarkDir: String,
      outputDir: String) =
    this(spark,
      () => spark.read.schema(Schemas.users).parquet(usersPath),
      watermarkDir, outputDir)

  private val log = LoggerFactory.getLogger(classOf[CdcEngine])
  private val wmStore = new WatermarkStore(spark, watermarkDir)

  private def users: DataFrame = usersSource()

  /** `GET /exports/watermark` (`app/main.py:94-107`). */
  def watermark(consumerId: String): Option[Timestamp] =
    wmStore.get(consumerId)

  /** `POST /exports/full` (`app/main.py:37-53`,
    * `app/services/exports.py:70-95`).
    */
  def fullExport(consumerId: String): ExportJob =
    runJob("full", consumerId) {
      Ops.exportOrder(Ops.exportProjection(Ops.activeOnly(users)))
    }

  /** `POST /exports/incremental` (`app/main.py:56-72`,
    * `app/services/exports.py:98-135`). Missing watermark ⇒ 0 rows, no
    * file, no watermark created.
    */
  def incrementalExport(consumerId: String): ExportJob =
    wmStore.get(consumerId) match {
      case None =>
        log.info(s"""export_skipped consumer=$consumerId reason=no_watermark""")
        emptyJob("incremental", consumerId)
      case Some(wm) =>
        runJob("incremental", consumerId) {
          Ops.exportOrder(
            Ops.exportProjection(Ops.incrementalChanges(users, wm)))
        }
    }

  /** `POST /exports/delta` (`app/main.py:75-91`,
    * `app/services/exports.py:138-171`). Soft-deletes included; rows
    * tagged DELETE / INSERT / UPDATE.
    */
  def deltaExport(consumerId: String): ExportJob =
    wmStore.get(consumerId) match {
      case None =>
        log.info(s"""export_skipped consumer=$consumerId reason=no_watermark""")
        emptyJob("delta", consumerId)
      case Some(wm) =>
        runJob("delta", consumerId) {
          Ops.exportOrder(Ops.withOperation(Ops.deltaChanges(users, wm)))
        }
    }

  /** `GET /health` analog (`app/main.py:17-22`). */
  def health(): (String, String) =
    ("ok", Instant.now().toString)

  // ---- job shell: filename mint, empty-guard, CSV, watermark advance ----

  private val stampFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  /** `{type}_{consumer}_{utcstamp}.csv` with spaces sanitized
    * (`app/main.py:31-34`).
    */
  private[cdc] def mintFilename(exportType: String, consumerId: String): String =
    s"${exportType}_${consumerId.replace(" ", "_")}_${stampFmt.format(Instant.now())}.csv"

  private def emptyJob(exportType: String, consumerId: String): ExportJob =
    ExportJob(
      jobId = java.util.UUID.randomUUID().toString,
      status = "completed",
      exportType = exportType,
      outputFilename = "",
      rowsExported = 0L,
    )

  private def runJob(exportType: String, consumerId: String)(
      plan: => DataFrame): ExportJob = {
    val jobId = java.util.UUID.randomUUID().toString
    val filename = mintFilename(exportType, consumerId)
    val t0 = System.nanoTime()
    log.info(s"export_started job=$jobId type=$exportType consumer=$consumerId")
    try {
      val df = plan
      // One pass over the data for the batch, cached so the empty-guard,
      // CSV write, and max(updated_at) agree on the same snapshot (the
      // reference materializes the batch once, exports.py:85,125,161 —
      // at cluster scale this cache would be a persisted staging dir).
      df.persist()
      try {
        Ops.maxUpdatedAt(df) match {
          case None => // empty batch: no file, watermark untouched
            log.info(s"export_completed job=$jobId rowsExported=0")
            ExportJob(jobId, "completed", exportType, "", 0L)
          case Some(wm) =>
            val rows = CsvSink.write(df, s"$outputDir/$filename")
            // advance-last ordering: state moves only after the sink
            // succeeded (app/services/jobs.py:42 commit discipline)
            wmStore.upsert(consumerId, wm)
            val secs = (System.nanoTime() - t0) / 1e9
            log.info(
              f"export_completed job=$jobId rowsExported=$rows durationSeconds=$secs%.3f")
            ExportJob(jobId, "completed", exportType, filename, rows)
        }
      } finally df.unpersist()
    } catch {
      case e: Throwable =>
        log.error(s"export_failed job=$jobId error=${e.getMessage}")
        throw e
    }
  }
}
