package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maintained SCD type-2 history: the history-preserving twin of
  * [[Compaction]]. Where Compaction keeps only each key's LATEST state,
  * Scd2 keeps every version as a validity interval — `valid_from` (the
  * row's own version column), `valid_to` (the next change's version,
  * null while open) and `is_current` — and maintains the table
  * incrementally with partition-pruned rewrites.
  *
  * The scaled analog of consuming the reference's `updated_at`
  * changelog (/root/reference/app/services/export.py:21-23) into an
  * auditable history instead of a mutable snapshot.
  *
  * Layout (same scheme as Compaction): `dir/data/bucket=N/` parquet
  * partitions hash-bucketed on the key, `dir/meta` self-describing.
  *
  * Merge semantics:
  *  - a batch touches only the buckets containing its keys; untouched
  *    bucket directories are never read, listed, or rewritten;
  *  - within a touched bucket, only CHANGED keys re-window — their full
  *    history (stored state records ∪ batch changes) is re-derived, so
  *    a late change that lands between two closed intervals splices in
  *    EXACTLY (no stale `valid_to` survives); unchanged keys' rows pass
  *    through untouched;
  *  - `(key, version)` identifies a change: replaying a batch
  *    deduplicates against stored rows, so at-least-once delivery
  *    converges to the same table;
  *  - tombstones (`deleteCol` true) are kept as history rows — they
  *    close their predecessor's interval, never become `is_current`,
  *    and a later non-tombstone version resurrects the key.
  *
  * History never shrinks, so merges cannot empty a bucket (no
  * emptied-directory sweep needed, unlike Compaction).
  */
object Scd2 {

  /** Outcome of one merge batch, for observability and specs. */
  final case class MergeStats(touchedBuckets: Seq[Int], rowsWritten: Long)

  private def bucketOf(key: org.apache.spark.sql.Column, nBuckets: Int) =
    Bucketing.bucketOf(key, nBuckets)

  /** History rows from a bag of state records: per-key lead window over
    * the version order. Tombstone ties are impossible once `(key,
    * version)` is deduplicated, so the order is total.
    */
  private def window(states: DataFrame, key: String, versionCol: String,
      deleteCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol))
    states
      .dropDuplicates(key, versionCol)
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && !col(deleteCol))
  }

  /** Build the history table from a full changelog (any number of
    * versions per key). `df` must carry `key`, `versionCol` (unique per
    * key — the change identity) and boolean `deleteCol`.
    */
  def init(df: DataFrame, dir: String, key: String,
      versionCol: String, deleteCol: String,
      nBuckets: Int = 256): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0, "nBuckets must be positive")
    // generated history columns: user data by these names would be
    // silently clobbered
    Compaction.requireNoReserved(df.columns.toSeq, "changelog schema")
    require(!df.columns.map(_.toLowerCase)
        .exists(Set("valid_to", "is_current")),
      "changelog schema collides with generated columns valid_to/is_current")
    window(df, key, versionCol, deleteCol)
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      // re-init is a full replace regardless of the session's
      // partitionOverwriteMode default
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/data")
    val schemaJson = window(df.limit(0), key, versionCol, deleteCol).schema
      .add("bucket", org.apache.spark.sql.types.IntegerType).json
    writeMeta(spark, dir, key, versionCol, deleteCol, nBuckets, schemaJson)
  }

  private def writeMeta(spark: SparkSession, dir: String, key: String,
      versionCol: String, deleteCol: String, nBuckets: Int,
      schemaJson: String): Unit =
    MetaFile.write(spark, dir, Map(
      "key" -> key, "version_col" -> versionCol,
      "delete_col" -> deleteCol, "n_buckets" -> nBuckets.toString,
      "schema_json" -> schemaJson))

  /** One read of the driver-side meta file per public call — merge
    * needs the key columns, the bucket count AND the stored schema —
    * pure bookkeeping that costs zero Spark jobs (see [[MetaFile]]).
    */
  private final case class Meta(key: String, versionCol: String,
      deleteCol: String, nBuckets: Int,
      schema: org.apache.spark.sql.types.StructType)

  private def loadMeta(spark: SparkSession, dir: String): Meta = {
    val m = MetaFile.read(spark, dir)
    Meta(m("key"), m("version_col"), m("delete_col"),
      m("n_buckets").toInt,
      org.apache.spark.sql.types.DataType.fromJson(m("schema_json"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private def storedData(spark: SparkSession, dir: String,
      m: Meta): DataFrame =
    spark.read.schema(m.schema).parquet(s"$dir/data")

  /** The pruned slice a merge of `touched` buckets reads — factored out
    * so Scd2Spec can assert the scan's selected-partition count.
    */
  private[cdc] def prunedHistory(spark: SparkSession, dir: String,
      touched: Seq[Int]): DataFrame =
    prunedHistory(spark, dir, touched, loadMeta(spark, dir))

  private def prunedHistory(spark: SparkSession, dir: String,
      touched: Seq[Int], m: Meta): DataFrame =
    storedData(spark, dir, m)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))

  /** Full history with intervals (no internal bucket column). */
  def read(spark: SparkSession, dir: String): DataFrame =
    storedData(spark, dir, loadMeta(spark, dir)).drop("bucket")

  /** Live state: open, non-tombstone versions only. */
  def current(spark: SparkSession, dir: String): DataFrame = {
    val m = loadMeta(spark, dir)
    storedData(spark, dir, m).drop("bucket").filter(col("is_current"))
      .drop("valid_to", "is_current").drop(m.deleteCol)
  }

  /** Time travel: the state as of version `v` — rows whose interval
    * covers `v` (`valid_from <= v < valid_to`, open intervals
    * unbounded), tombstones excluded.
    */
  def asOf(spark: SparkSession, dir: String, v: Any): DataFrame = {
    val m = loadMeta(spark, dir)
    val (versionCol, deleteCol) = (m.versionCol, m.deleteCol)
    storedData(spark, dir, m).drop("bucket")
      .filter(col(versionCol) <= lit(v) &&
        (col("valid_to").isNull || col("valid_to") > lit(v)) &&
        !col(deleteCol))
      .drop("valid_to", "is_current")
  }

  /** Apply one change batch (state records carrying the same key /
    * version / delete columns and payload schema as `init`'s input).
    */
  def merge(spark: SparkSession, dir: String, changes0: DataFrame): MergeStats = {
    val m = loadMeta(spark, dir)
    val (key, versionCol, deleteCol, nBuckets) =
      (m.key, m.versionCol, m.deleteCol, m.nBuckets)
    val changes = changes0
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = changes.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) { changes.unpersist(); return MergeStats(Nil, 0L) }

    val hist = prunedHistory(spark, dir, touched, m)
    val changedKeys = changes.select(col(key)).distinct()
    // unchanged keys: rows pass through byte-equivalent; changed keys:
    // stored rows collapse back to state records and re-window together
    // with the batch (exact late-data splicing, see object doc).
    // allowMissingColumns = schema evolution: a batch that adds a
    // column null-extends stored history (meta widens below); a batch
    // missing a stored column null-fills its own rows.
    val untouchedRows = hist.join(changedKeys, Seq(key), "left_anti")
    val stateCols = hist.columns
      .filterNot(c => c == "valid_to" || c == "is_current").map(col)
    val rewound = hist.join(changedKeys, Seq(key), "left_semi")
      .select(stateCols: _*)
      .unionByName(changes, allowMissingColumns = true)
    val rebuilt = window(rewound, key, versionCol, deleteCol)
    val out = untouchedRows.unionByName(rebuilt, allowMissingColumns = true)

    // One pass, no persist: dynamic overwrite stages task output under
    // the destination and only swaps bucket directories at job commit,
    // so the pre-image slice this plan reads stays intact for the whole
    // computation (same read-while-rewriting shape AggView.merge uses).
    out
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$dir/data")
    // MergeStats.rows = the rewritten slice, counted back from its
    // footers (partition-pruned, no data pages) — cheaper than caching
    // the entire output just to count it pre-write. Every touched
    // bucket exists post-write: a merge only ever ADDS rows to a
    // bucket's history (deletes are tombstone audit rows).
    val rows = prunedHistory(spark, dir, touched, m).count()
    // widen the meta schema when the batch introduced columns (fields
    // forced nullable: pre-evolution files genuinely lack them)
    val oldFields = m.schema.fieldNames.toSeq
    if (out.schema.fieldNames.toSeq != oldFields) {
      val widened = org.apache.spark.sql.types.StructType(
        out.schema.fields.map(_.copy(nullable = true))).json
      writeMeta(spark, dir, key, versionCol, deleteCol, nBuckets, widened)
    }
    changes.unpersist()
    MergeStats(touched, rows)
  }
}
