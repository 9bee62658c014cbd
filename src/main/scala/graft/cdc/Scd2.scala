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
  * incrementally with path-pruned rewrites.
  *
  * The scaled analog of consuming the reference's `updated_at`
  * changelog (/root/reference/app/services/export.py:21-23) into an
  * auditable history instead of a mutable snapshot.
  *
  * Layout (same manifest protocol as Compaction, see [[TxLog]]):
  * immutable `dir/data/g<V>/bucket=B` parquet directories hash-bucketed
  * on the key, published by a versioned manifest whose single rename is
  * the commit point — a crashed merge leaves the previous version
  * byte-identical, never a torn bucket mix.
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
  * emptied-bucket accounting needed, unlike Compaction).
  */
object Scd2 {

  /** Outcome of one merge batch, for observability and specs. */
  final case class MergeStats(touchedBuckets: Seq[Int], rowsWritten: Long)

  private def bucketOf(keys: Seq[org.apache.spark.sql.Column], nBuckets: Int) =
    Bucketing.bucketOf(keys, nBuckets)

  /** Generated interval columns: user data by these names would be
    * silently clobbered — init AND merge both fail fast (a merge batch
    * carrying them used to be silently rewritten).
    */
  private def requireNoGenerated(cols: Seq[String], what: String): Unit = {
    Compaction.requireNoReserved(cols, what)
    require(!cols.map(_.toLowerCase)
        .exists(Set("valid_to", "is_current")),
      s"$what collides with generated columns valid_to/is_current")
  }

  /** History rows from a bag of state records: per-key lead window over
    * the version order. Tombstone ties are impossible once `(key,
    * version)` is deduplicated, so the order is total.
    */
  private def window(states: DataFrame, keys: Seq[String], versionCol: String,
      deleteCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    states
      .dropDuplicates(keys :+ versionCol)
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && !col(deleteCol))
  }

  /** Build the history table from a full changelog (any number of
    * versions per key). `df` must carry `key`, `versionCol` (unique per
    * key — the change identity) and boolean `deleteCol`.
    */
  def init(df: DataFrame, dir: String, key: String,
      versionCol: String, deleteCol: String,
      nBuckets: Int = 256): Unit =
    init(df, dir, Seq(key), versionCol, deleteCol, nBuckets)

  /** Composite-key form (e.g. `(tenant_id, id)`): history intervals
    * are maintained per key TUPLE; see [[Compaction.init]].
    */
  def init(df: DataFrame, dir: String, keys: Seq[String],
      versionCol: String, deleteCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0, "nBuckets must be positive")
    requireNoGenerated(df.columns.toSeq, "changelog schema")
    Bucketing.encodeKeys(keys)
    keys.foreach(k => require(df.columns.contains(k),
      s"key column '$k' missing from the changelog schema"))
    val fs = TxLog.fs(spark, dir)
    Seq("manifest", "data", ".staging", "meta")
      .foreach(sub => fs.delete(new Path(s"$dir/$sub"), true))
    TxLog.invalidate(dir)
    val txn = new TableTxn(spark, dir, baseVersion = -1L)
    window(df, keys, versionCol, deleteCol)
      .withColumn("bucket", bucketOf(keys.map(col), nBuckets))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket") +: keys.map(col): _*)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"${txn.staging}/data")
    val staged = txn.stagedBucketIds()
    txn.installAndCommit(
      staged.map(b => b -> txn.bucketRel(b)).toMap,
      coreProps(keys, versionCol, deleteCol, nBuckets,
        window(df.limit(0), keys, versionCol, deleteCol).schema.json) ++
        Compaction.rowProps(Compaction.stagedStats(
          spark, txn.staging, staged, versionCol)))
    txn.cleanup()
  }

  private def coreProps(keys: Seq[String], versionCol: String,
      deleteCol: String,
      nBuckets: Int, schemaJson: String): Map[String, String] = Map(
    "key" -> Bucketing.encodeKeys(keys), "version_col" -> versionCol,
    "delete_col" -> deleteCol, "n_buckets" -> nBuckets.toString,
    "schema_json" -> schemaJson)

  /** One read of the driver-side manifest per public call — merge needs
    * the key columns, the bucket count, the stored schema AND the live
    * bucket map — pure bookkeeping that costs zero Spark jobs.
    */
  private final case class Meta(snap: TxLog.Snapshot, keys: Seq[String],
      versionCol: String, deleteCol: String, nBuckets: Int,
      schema: org.apache.spark.sql.types.StructType) {
    def buckets: Map[Int, String] = snap.buckets
    def keyCols: Seq[org.apache.spark.sql.Column] = keys.map(col)
  }

  private def loadMeta(spark: SparkSession, dir: String): Meta = {
    val snap = TxLog.latest(spark, dir).getOrElse(throw new
      IllegalArgumentException(s"no committed manifest under $dir"))
    Meta(snap, Bucketing.decodeKeys(snap.props("key")),
      snap.props("version_col"),
      snap.props("delete_col"), snap.props("n_buckets").toInt,
      org.apache.spark.sql.types.DataType.fromJson(snap.props("schema_json"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private def readBuckets(spark: SparkSession, dir: String, m: Meta,
      rels: Iterable[String]): DataFrame = {
    val paths = rels.map(rel => s"$dir/data/$rel").toSeq
    val noBucket = if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(paths: _*)
    noBucket.withColumn("bucket", bucketOf(m.keyCols, m.nBuckets))
  }

  private def storedData(spark: SparkSession, dir: String,
      m: Meta): DataFrame =
    readBuckets(spark, dir, m, m.buckets.values)

  /** Absolute live bucket directories (for specs and path accounting). */
  private[graft] def livePaths(spark: SparkSession, dir: String): Map[Int, String] =
    loadMeta(spark, dir).buckets.map { case (b, rel) => b -> s"$dir/data/$rel" }

  /** The (key, versionCol, deleteCol, nBuckets) the table runs with. */
  def readMeta(spark: SparkSession, dir: String): (String, String, String, Int) = {
    val m = loadMeta(spark, dir)
    (m.keys.mkString(","), m.versionCol, m.deleteCol, m.nBuckets)
  }

  /** One key's FULL history (all its validity intervals, tombstones
    * included) from the single bucket directory that can hold it —
    * the audit query "show me everything this key ever was", O(1
    * bucket) on a history of any size (same mechanics as
    * [[Compaction.lookup]]).
    */
  def lookup(spark: SparkSession, dir: String, keyValue: Any): DataFrame = {
    val m = loadMeta(spark, dir)
    val vals = keyValue match {
      case s: Seq[_] => s.toSeq
      case v => Seq(v)
    }
    require(vals.size == m.keys.size,
      s"key tuple arity ${vals.size} != table key (${m.keys.mkString(", ")})")
    val bucket = Bucketing.bucketOfValues(vals, m.nBuckets)
    readBuckets(spark, dir, m, m.buckets.get(bucket).toSeq)
      .drop("bucket")
      .filter(m.keys.zip(vals).map { case (k, v) => col(k) === lit(v) }
        .reduce(_ && _))
  }

  /** The pruned slice a merge of `touched` buckets reads — factored out
    * so Scd2Spec can assert the scan opens only touched buckets' files.
    */
  private[graft] def prunedHistory(spark: SparkSession, dir: String,
      touched: Seq[Int]): DataFrame =
    prunedHistory(spark, dir, touched, loadMeta(spark, dir))

  private def prunedHistory(spark: SparkSession, dir: String,
      touched: Seq[Int], m: Meta): DataFrame = {
    val t = touched.toSet
    readBuckets(spark, dir, m, m.buckets.view.filterKeys(t.contains).values)
  }

  /** Resize the history table's bucket count in ONE committed full
    * rewrite — same contract as [[Compaction.rebucket]]: the version
    * lineage continues, stats and zone maps recompute in the staged
    * footer pass, readers never see an intermediate state, racing
    * writers conflict-retry, and a merge in flight under the old
    * layout detects the change and restarts re-bucketed.
    */
  def rebucket(spark: SparkSession, dir: String, newNBuckets: Int,
      retainHistory: Boolean = false): Unit = {
    require(newNBuckets > 0, "nBuckets must be positive")
    TxLog.withOcc(spark, dir) {
      val m = loadMeta(spark, dir)
      if (m.nBuckets == newNBuckets) return
      TxLog.sweep(spark, dir)
      val txn = new TableTxn(spark, dir, m.snap.version)
      storedData(spark, dir, m).drop("bucket")
        .withColumn("bucket", bucketOf(m.keyCols, newNBuckets))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket") +: m.keyCols: _*)
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"${txn.staging}/data")
      val staged = txn.stagedBucketIds()
      txn.installAndCommit(
        staged.map(b => b -> txn.bucketRel(b)).toMap,
        coreProps(m.keys, m.versionCol, m.deleteCol, newNBuckets,
          m.schema.json) ++
          Compaction.rowProps(Compaction.stagedStats(
            spark, txn.staging, staged, m.versionCol)))
      TxLog.hygiene {
        txn.cleanup()
        if (!retainHistory) TxLog.vacuum(spark, dir, txn.newVersion)
      }
    }
  }

  /** Full history with intervals (no internal bucket column). */
  def read(spark: SparkSession, dir: String): DataFrame =
    storedData(spark, dir, loadMeta(spark, dir)).drop("bucket")

  /** Exact history row count from the manifest alone (zero file
    * opens) — every commit records per-bucket counts; buckets from a
    * pre-stats manifest fall back to a path-pruned count.
    */
  def countRows(spark: SparkSession, dir: String): Long = {
    val m = loadMeta(spark, dir)
    val counted = m.snap.props.collect {
      case (k, v) if k.startsWith("rows.") =>
        k.drop("rows.".length).toInt -> v.toLong
    }.toMap
    val missing = m.buckets.keySet -- counted.keySet
    val rest = if (missing.isEmpty) 0L
      else readBuckets(spark, dir, m,
        m.buckets.view.filterKeys(missing.contains).values).count()
    counted.values.sum + rest
  }

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
    var attempts = 0
    while (true) {
      try return mergeBucketed(spark, dir, changes0)
      catch {
        case _: Compaction.RebucketedDuringWrite if attempts < 3 =>
          attempts += 1
      }
    }
    sys.error("unreachable")
  }

  private def mergeBucketed(spark: SparkSession, dir: String,
      changes0: DataFrame): MergeStats = {
    // bucket and cache the batch ONCE, re-resolve the snapshot per OCC
    // attempt; a concurrent rebucket invalidates the cached bucket ids
    // and restarts merge() wholesale (see Compaction)
    val m0 = loadMeta(spark, dir)
    requireNoGenerated(changes0.columns.toSeq, "merge batch schema")
    val changes = changes0
      .withColumn("bucket", bucketOf(m0.keyCols, m0.nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = changes.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return MergeStats(Nil, 0L)
      TxLog.withOcc(spark, dir) {
        mergeOnce(spark, dir, changes, touched, m0.nBuckets)
      }
    } finally changes.unpersist()
  }

  private def mergeOnce(spark: SparkSession, dir: String,
      changes: DataFrame, touched: Seq[Int],
      bucketedWith: Int): MergeStats = {
    val m = loadMeta(spark, dir)
    if (m.nBuckets != bucketedWith)
      throw new Compaction.RebucketedDuringWrite
    val (keys, versionCol, deleteCol, nBuckets) =
      (m.keys, m.versionCol, m.deleteCol, m.nBuckets)
    TxLog.sweep(spark, dir)
    val txn = new TableTxn(spark, dir, m.snap.version)

    val hist = prunedHistory(spark, dir, touched, m)
    val changedKeys = changes.select(m.keyCols: _*).distinct()
    // unchanged keys: rows pass through byte-equivalent; changed keys:
    // stored rows collapse back to state records and re-window together
    // with the batch (exact late-data splicing, see object doc).
    // allowMissingColumns = schema evolution: a batch that adds a
    // column null-extends stored history (manifest widens below); a
    // batch missing a stored column null-fills its own rows.
    val untouchedRows = hist.join(changedKeys, keys, "left_anti")
    val stateCols = hist.columns
      .filterNot(c => c == "valid_to" || c == "is_current").map(col)
    val rewound = hist.join(changedKeys, keys, "left_semi")
      .select(stateCols: _*)
      .unionByName(changes, allowMissingColumns = true)
    val rebuilt = window(rewound, keys, versionCol, deleteCol)
    val out = untouchedRows.unionByName(rebuilt, allowMissingColumns = true)

    // stage the touched buckets' full new contents; the committed
    // pre-image directories stay live (and readable by this very plan)
    // until a LATER merge's sweep reclaims them — the read-while-
    // rewriting hazard the old in-place dynamic overwrite had is gone
    out
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket") +: m.keyCols: _*)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"${txn.staging}/data")
    val staged = txn.stagedBucketIds()
    val newBuckets = (m.buckets -- touched) ++
      staged.map(b => b -> txn.bucketRel(b))
    // widen the manifest schema when the batch introduced columns
    // (fields forced nullable: pre-evolution files genuinely lack them)
    val outData = out.drop("bucket").schema
    val schemaJson = if (outData.fieldNames.toSeq != m.schema.fieldNames.toSeq)
      org.apache.spark.sql.types.StructType(
        outData.fields.map(_.copy(nullable = true))).json
    else m.schema.json
    // per-bucket stats (rows + valid_from zone maps, the same footer
    // pass Compaction uses): untouched buckets carry theirs forward so
    // countRows stays exact and history watermark SQL prunes
    val carried = m.snap.props.collect {
      case (k, v) if Seq("rows.", "minv.", "maxv.").exists(p =>
          k.startsWith(p) && !touched.contains(k.drop(p.length).toInt))
        => k -> v
    }
    val newStats = Compaction.stagedStats(
      spark, txn.staging, staged, versionCol)
    // MergeStats.rows = the staged slice counted from its own footers
    // BEFORE install (metadata, no data pages) — the old post-commit
    // pruned re-read resolved the manifest and schema a second time
    // for the same number
    val rows = newStats.values.map(_.rows).sum
    txn.installAndCommit(newBuckets,
      coreProps(keys, versionCol, deleteCol, nBuckets, schemaJson) ++
        carried ++ Compaction.rowProps(newStats))
    TxLog.hygiene { txn.cleanup(); TxLog.vacuum(spark, dir, txn.newVersion) }
    MergeStats(touched, rows)
  }
}
