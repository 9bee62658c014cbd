package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed keyed MERGE: maintains a compacted latest-state table
  * across change batches — the cluster-scale analog of the reference's
  * row-level upsert paths (`ON CONFLICT` inserts,
  * `/root/reference/app/seed_users.py:39-43`, and the read-modify-write
  * watermark upsert, `/root/reference/app/services/watermark.py:11-27`).
  * Where [[WatermarkStore]] rewrites its bytes-sized state wholesale,
  * this operator maintains a DATA-PLANE table (the 100 TB users/
  * documents corpus itself) and must therefore never rewrite more than
  * it touches.
  *
  * Layout: `<dir>/data/bucket=N/…` — the table is hash-bucketed on the
  * merge key (`pmod(xxhash64(key), nBuckets)`) and stored as one
  * partition directory per bucket, plus `<dir>/meta` pinning
  * (key, versionCol, deleteCol, nBuckets) so every later merge derives
  * the exact same bucketing (a mismatched bucket function would
  * silently split keys across partitions — same self-describing-index
  * rule as Dedup.writeLshIndex).
  *
  * A merge batch:
  *  1. buckets the changelog with the stored hash;
  *  2. collects the DISTINCT touched bucket ids (bounded by nBuckets —
  *     a driver-sized list by construction, never O(rows));
  *  3. reads ONLY those partitions of the snapshot (partition-pruned
  *     scan: the filter is on the partition column);
  *  4. reconciles latest-state per key — max version wins, changelog
  *     beats snapshot at equal version (the upsert), winners flagged
  *     deleted are dropped (the DELETE);
  *  5. overwrites ONLY the touched `bucket=N` directories (dynamic
  *     partition overwrite), removing any touched bucket whose keys
  *     were all deleted — dynamic overwrite alone would silently leave
  *     the stale directory behind and resurrect the rows.
  *
  * Cost per batch is O(|changes| + |snapshot rows sharing a bucket
  * with a change|): at 100 TB with 4096 buckets, a batch touching 1%
  * of keys reads/writes ~1% of partitions, and an untouched partition
  * is never opened (asserted byte-for-byte in CompactionSpec). On a
  * real cluster the same semantics would ride an ACID table format's
  * MERGE; this is the plain-parquet expression of that plan.
  */
object Compaction {

  /** Outcome of one merge batch, for observability and specs. */
  final case class MergeStats(
      touchedBuckets: Seq[Int],
      emptiedBuckets: Seq[Int],
      rowsWritten: Long,
      feedRows: Long = 0L)

  private def bucketOf(key: org.apache.spark.sql.Column, nBuckets: Int) =
    Bucketing.bucketOf(key, nBuckets)

  /** Create (or replace) the compacted table from an initial snapshot.
    * `df` must carry `key` and `versionCol`; `deleteCol` is a boolean
    * tombstone column (rows arriving with it true delete the key).
    */
  /** Column names the operator generates internally; user data
    * carrying one would be silently replaced or dropped, so init
    * rejects them up front.
    */
  private[cdc] val ReservedCols =
    Set("bucket", "batch", "_src", "_rn", "_change_type", "_had_stored",
      "_pre", "_f")

  private[cdc] def requireNoReserved(cols: Seq[String], what: String): Unit = {
    val clash = cols.map(_.toLowerCase).toSet.intersect(ReservedCols)
    require(clash.isEmpty,
      s"$what collides with reserved internal columns: ${clash.mkString(", ")}")
  }

  def init(df: DataFrame, dir: String, key: String,
      versionCol: String, deleteCol: String,
      nBuckets: Int = 256): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0, "nBuckets must be positive")
    requireNoReserved(df.columns.toSeq, "table schema")
    // a re-init is a full table replace: any change feed or retained
    // history from the previous incarnation describes state that no
    // longer exists
    val fs0 = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs0.delete(new Path(s"$dir/feed"), true)
    fs0.delete(new Path(s"$dir/_history"), true)
    df.filter(!col(deleteCol))
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      // hash-partition on bucket + in-partition (bucket, key) sort:
      // one writer task per bucket, deterministic file content, and
      // no per-write range-sampling job (measured on the merge-family
      // bench queries — three writes each paid a sampling pass)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      // a session-wide dynamic default would leave old bucket dirs of
      // a previous incarnation alive under a smaller re-init snapshot
      // and resurrect their rows — a re-init is a FULL replace
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/data")
    // the data schema rides in the meta too: a table whose every key
    // was deleted has no parquet footers left to infer from, and reads
    // with an explicit schema stay well-defined on an empty dir
    val schemaJson = df.schema
      .add("bucket", org.apache.spark.sql.types.IntegerType).json
    writeMeta(spark, dir, key, versionCol, deleteCol, nBuckets, schemaJson)
  }

  private def writeMeta(spark: SparkSession, dir: String, key: String,
      versionCol: String, deleteCol: String, nBuckets: Int,
      schemaJson: String, extra: Map[String, String] = Map.empty): Unit =
    MetaFile.write(spark, dir, Map(
      "key" -> key, "version_col" -> versionCol,
      "delete_col" -> deleteCol, "n_buckets" -> nBuckets.toString,
      "schema_json" -> schemaJson) ++ extra)

  /** One read of the driver-side meta file per public call: merge
    * needs the key columns, the bucket count AND the stored schema —
    * pure bookkeeping that costs zero Spark jobs (see [[MetaFile]]).
    */
  private final case class Meta(key: String, versionCol: String,
      deleteCol: String, nBuckets: Int,
      schema: org.apache.spark.sql.types.StructType,
      extra: Map[String, String]) {
    /** Monotonic counters + vacuum floor (see nextBatch/readAsOf):
      * survive directory deletion, so numbering never restarts.
      */
    def counter(name: String): Long =
      extra.get(name).map(_.toLong).getOrElse(0L)
  }

  private val CoreMetaKeys =
    Set("key", "version_col", "delete_col", "n_buckets", "schema_json")

  private def loadMeta(spark: SparkSession, dir: String): Meta = {
    val m = MetaFile.read(spark, dir)
    Meta(m("key"), m("version_col"), m("delete_col"),
      m("n_buckets").toInt,
      org.apache.spark.sql.types.DataType.fromJson(m("schema_json"))
        .asInstanceOf[org.apache.spark.sql.types.StructType],
      m.view.filterKeys(k => !CoreMetaKeys.contains(k)).toMap)
  }

  /** The (key, versionCol, deleteCol, nBuckets) a table was built with. */
  def readMeta(spark: SparkSession, dir: String): (String, String, String, Int) = {
    val m = loadMeta(spark, dir)
    (m.key, m.versionCol, m.deleteCol, m.nBuckets)
  }

  private def storedData(spark: SparkSession, dir: String,
      m: Meta): DataFrame =
    spark.read.schema(m.schema).parquet(s"$dir/data")

  /** The live table, without the internal bucket column. */
  def read(spark: SparkSession, dir: String): DataFrame =
    storedData(spark, dir, loadMeta(spark, dir)).drop("bucket")

  /** Next change-feed batch id: one past the highest committed batch.
    * A driver-side listing of ≤ |merges| directory names — metadata,
    * never data.
    */
  private def nextBatch(spark: SparkSession, dir: String, m: Meta): Long = {
    val p = new Path(s"$dir/feed")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val fromDirs = if (!fs.exists(p)) 0L
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.drop(6).toLong }
      .foldLeft(-1L)(math.max) + 1L
    // max with the meta counter: a vacuum that deleted EVERY feed dir
    // must not restart numbering at 0 — a consumer resuming from
    // "batch >= K" would silently skip all post-vacuum batches
    math.max(fromDirs, m.counter("next_feed_batch"))
  }

  /** Retained history versions (ascending): `v` values for which
    * `readAsOf(v)` can reconstruct the pre-merge state, provided every
    * later merge also retained.
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(s"$dir/_history")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toLong }.sorted
  }

  /** Time travel: the table as it stood AFTER `version` retaining
    * merges (version 0 = the initial snapshot). Works because a
    * retaining merge RENAMES each touched bucket directory into
    * `_history/v=K` before rewriting it — a metadata move, no byte is
    * copied — so for every bucket the state at version v is either the
    * pre-image saved by the FIRST retaining merge ≥ v that touched it
    * (no rewrite happened in between, so the two states coincide), or
    * the live directory if no later merge touched it. The
    * reconstruction is driver-side listings plus one partition-pruned
    * scan per involved history version — O(merges + buckets) metadata,
    * never a table copy. Requires every merge since `version` to have
    * run with `retainHistory = true`; rows read back in the CURRENT
    * schema (columns added later null-extend, exactly like untouched
    * buckets do after an evolution).
    */
  def readAsOf(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = loadMeta(spark, dir)
    // vacuumed pre-images make older versions unreconstructible; the
    // fallback-to-live logic below would then silently return a mixed
    // frame corresponding to no state that ever existed
    val floor = m.counter("history_floor")
    require(version >= floor,
      s"version $version was vacuumed; oldest reconstructible is $floor")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // bucket -> earliest history version >= `version` holding its pre-image
    val chosen = scala.collection.mutable.Map.empty[Int, Long]
    versions(spark, dir).filter(_ >= version).foreach { v =>
      fs.listStatus(new Path(s"$dir/_history/v=$v")).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("bucket=")) {
          val b = name.drop(7).toInt
          if (!chosen.contains(b)) chosen(b) = v
        }
      }
    }
    val live = storedData(spark, dir, m)
      .filter(!col("bucket").isin(chosen.keys.toSeq.map(Integer.valueOf): _*))
    chosen.toSeq.groupBy(_._2).foldLeft(live) { case (acc, (v, buckets)) =>
      val paths = buckets.map { case (b, _) => s"$dir/_history/v=$v/bucket=$b" }
      acc.unionByName(
        spark.read.schema(m.schema)
          .option("basePath", s"$dir/_history/v=$v")
          .parquet(paths: _*),
        allowMissingColumns = true)
    }.drop("bucket")
  }

  /** Drop history versions below `keepFrom` (and, with `feedBefore`,
    * feed batches below it): the retention knob that bounds time-travel
    * storage. Driver-side directory deletes only.
    */
  def vacuum(spark: SparkSession, dir: String, keepFromVersion: Long,
      feedBefore: Long = 0L): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val m = loadMeta(spark, dir)
    // derive the next version BEFORE deleting (pre-counter tables have
    // only the directory listing to go by)
    val nextVersion = math.max(
      versions(spark, dir).foldLeft(-1L)(math.max) + 1L,
      m.counter("next_history_version"))
    versions(spark, dir).filter(_ < keepFromVersion).foreach { v =>
      fs.delete(new Path(s"$dir/_history/v=$v"), true)
    }
    val feedRoot = new Path(s"$dir/feed")
    if (feedBefore > 0L && fs.exists(feedRoot))
      fs.listStatus(feedRoot).map(_.getPath.getName)
        .collect { case s if s.startsWith("batch=") => s.drop(6).toLong }
        .filter(_ < feedBefore)
        .foreach(b => fs.delete(new Path(s"$dir/feed/batch=$b"), true))
    // record what is no longer reconstructible so readAsOf can refuse
    // instead of silently mixing states, and so history/feed numbering
    // never restarts even when every directory was deleted. The floor
    // caps at the NEXT version: versions not yet written will be
    // reconstructible when they exist, however large keepFromVersion.
    // The counter also rides along so the next retaining merge cannot
    // renumber from 0 after a full purge.
    writeMeta(spark, dir, m.key, m.versionCol, m.deleteCol, m.nBuckets,
      m.schema.json, m.extra ++ Map(
        "next_history_version" -> nextVersion.toString,
        "history_floor" -> math.max(m.counter("history_floor"),
          math.min(keepFromVersion, nextVersion)).toString))
  }

  /** The accumulated change data feed: every feed batch ever emitted,
    * in the table's schema plus `_change_type` (insert /
    * update_preimage / update_postimage / delete) and the partition
    * column `batch` identifying which merge produced each row. Reads
    * are partition-pruned by `batch` — a consumer resuming from batch
    * K scans only the new directories.
    */
  def readFeed(spark: SparkSession, dir: String): DataFrame =
    // mergeSchema: feed batches written before a schema evolution have
    // narrower files; the union schema null-extends them exactly like
    // the table read does
    spark.read.option("mergeSchema", "true").parquet(s"$dir/feed")

  /** Reinterpret a change-feed slice as a changelog a REPLICA table can
    * merge — the CDC replication chain (source merge → feed → replica
    * merge) closed over this engine's own operators. Postimages and
    * inserts pass through as upserts; `delete` preimages become
    * tombstones carrying the DELETED row's version, which still wins
    * because a change beats the stored row at EQUAL version (the
    * ON-CONFLICT tie-break doubles as the replication delete rule).
    * `update_preimage` rows drop — the postimage carries the new state.
    * Apply each feed batch in order; the replica then equals the
    * source after every batch (ReplicationSpec).
    */
  def feedAsChangelog(feed: DataFrame, deleteCol: String): DataFrame =
    feed.filter(col("_change_type") =!= "update_preimage")
      .withColumn(deleteCol, col("_change_type") === "delete")
      .drop("_change_type", "batch")

  /** The partition-pruned slice of the snapshot a merge of `touched`
    * buckets reads — factored out so CompactionSpec can assert the
    * scan's selected-partition count equals |touched|.
    */
  private[cdc] def prunedSnapshot(spark: SparkSession, dir: String,
      touched: Seq[Int]): DataFrame =
    prunedSnapshot(spark, dir, touched, loadMeta(spark, dir))

  private def prunedSnapshot(spark: SparkSession, dir: String,
      touched: Seq[Int], m: Meta): DataFrame =
    storedData(spark, dir, m)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))

  /** Apply one change batch to the table at `dir` (see object doc).
    * Changelog rows must carry the table's key/version/delete columns
    * and the same data schema; the highest version per key wins, a
    * change beats the stored row at equal version, and a winning
    * tombstone removes the key.
    *
    * With `emitFeed = true` the merge also materializes a CHANGE DATA
    * FEED batch under `<dir>/feed/batch=N`: one row per row-level
    * effect the merge had on the table, in the table's schema plus a
    * `_change_type` discriminator — `insert` (postimage of a new key),
    * `update_preimage`/`update_postimage` (the replaced row and its
    * replacement), `delete` (preimage of a removed key). Changelog
    * rows that LOSE the version race, and tombstones for absent keys,
    * produce no feed rows — the feed describes the table delta, not
    * the input. This is the downstream-facing half of CDC: the
    * reference EXPORTS per-row operation tags computed from
    * timestamps (`/root/reference/app/services/export.py` delta
    * classifier); a maintained table at scale derives them from what
    * the merge actually did, so consumers can subscribe to `feed/`
    * instead of diffing 100 TB snapshots.
    */
  def merge(spark: SparkSession, dir: String, changelog: DataFrame,
      emitFeed: Boolean = false, retainHistory: Boolean = false): MergeStats = {
    val m = loadMeta(spark, dir)
    val (key, versionCol, deleteCol, nBuckets) =
      (m.key, m.versionCol, m.deleteCol, m.nBuckets)
    val dataCols = changelog.columns.filterNot(_ == "bucket")
    requireNoReserved(dataCols.toSeq, "changelog schema")

    val changes = changelog
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // distinct over the partition-id domain: ≤ nBuckets values, a
    // metadata-sized collect regardless of batch row count
    val touched = changes.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) { changes.unpersist(); return MergeStats(Nil, Nil, 0L) }

    // stored rows never carry tombstones (init/merge drop them), so
    // rank snapshot rows as source=0 vs changelog source=1: on a
    // version tie the change wins — INSERT .. ON CONFLICT DO UPDATE.
    // allowMissingColumns = schema evolution both ways: a changelog
    // that ADDS a column null-fills stored rows (and widens the meta
    // schema below, so untouched buckets' narrower files read back
    // null-extended); a changelog missing a stored column null-fills
    // its own rows.
    val snapshot = prunedSnapshot(spark, dir, touched, m)
      .withColumn("_src", lit(0))
    val unioned = snapshot.unionByName(
      changes.select(col("bucket") +: dataCols.map(col): _*)
        .withColumn("_src", lit(1)),
      allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col("_src").desc)
    val ranked0 = unioned.withColumn("_rn", row_number().over(w))
    // with a feed to emit, the union+shuffle+window feeds TWO outputs
    // (feed classification and table winners) — cache it so the
    // snapshot slice is scanned and ranked once, not per output
    val ranked = if (emitFeed)
      ranked0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ranked0
    val winners = ranked
      .filter(col("_rn") === 1 && !col(deleteCol))
      .drop("_rn", "_src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // commit protocol: EVERYTHING expensive writes into `.staging`
    // first, and only cheap metadata renames touch the live table —
    // a write failure (disk full, lost executors) before the install
    // step leaves the table byte-identical, and the feed publishes
    // only AFTER the table commit so an at-least-once retry of a
    // crashed merge re-derives a zero-effect delta (equal-version
    // rewrite: pre == post, retraction pairs cancel) instead of a
    // duplicate real one under a fresh batch id. Residual window:
    // a crash in the middle of the per-bucket install renames leaves
    // some buckets new and some old — with retainHistory the pre-
    // images survive in _history; full atomicity needs a transaction
    // log (stated, not papered over).
    val staging = s"$dir/.staging"
    fs.delete(new Path(staging), true) // stale staging of a crashed merge

    val feedRows: Long = if (!emitFeed) 0L else {
      // per-key preimage = the (unique) stored row, surfaced to the
      // winning changelog row via key-partitioned window aggregates —
      // the SAME hash partitioning as the ranking window, so the feed
      // rides the existing shuffle instead of adding one. The feed is
      // derived from `ranked` (not recomputed) so a pathological
      // changelog with duplicate (key, version) rows can never make
      // the feed disagree with what the table actually stored.
      val allCols = unioned.columns.toSeq
        .filterNot(c => c == "bucket" || c == "_src")
      val rowStruct = struct(allCols.map(col): _*)
      val wKey = Window.partitionBy(col(key))
      val classified = ranked
        .withColumn("_had_stored",
          max(when(col("_src") === 0, 1).otherwise(0)).over(wKey))
        .withColumn("_pre",
          first(when(col("_src") === 0, rowStruct), ignoreNulls = true)
            .over(wKey))
        .filter(col("_rn") === 1 && col("_src") === 1)
        // a tombstone for a key the table never held: no table effect
        .filter(!(col(deleteCol) && col("_had_stored") === 0))
        .select(col("bucket"), explode(
          when(col(deleteCol),
            array(struct(lit("delete").as("change_type"),
              col("_pre").as("payload"))))
          .when(col("_had_stored") === 1,
            array(
              struct(lit("update_preimage").as("change_type"),
                col("_pre").as("payload")),
              struct(lit("update_postimage").as("change_type"),
                rowStruct.as("payload"))))
          .otherwise(array(struct(lit("insert").as("change_type"),
            rowStruct.as("payload"))))).as("_f"))
        .select(col("_f.payload.*"),
          col("_f.change_type").as("_change_type"), col("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = classified.count()
      classified
        .repartition(col("bucket")).drop("bucket")
        .write.mode("overwrite").parquet(s"$staging/feed")
      classified.unpersist()
      n
    }

    // stage the new bucket contents while every pre-image directory is
    // still live: the write job reads the real files, so losing cache
    // blocks mid-write merely recomputes — nothing depends on the
    // persisted `winners` for CORRECTNESS anymore, only for not
    // re-running the union+window per output
    val rows = winners.count()
    winners
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .parquet(s"$staging/data")
    val stagedBuckets = fs.listStatus(new Path(s"$staging/data")).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("bucket=") => s.drop(7).toInt }
      .toSet
    // a touched bucket with zero surviving keys staged no partition:
    // its live directory is removed below and never reinstalled
    val emptied = touched.filterNot(stagedBuckets)

    var extra = m.extra
    if (retainHistory) {
      // snapshot-by-rename: each touched bucket's directory moves into
      // `_history/v=K` — a metadata operation regardless of data size,
      // the immutable-file trick a transaction-log format uses for
      // time travel, expressed in directories. A touched bucket with
      // no directory yet records an EMPTY pre-image dir, so readAsOf
      // earlier versions shows it absent instead of leaking today's
      // rows backwards. K rides a meta counter so a full vacuum can
      // never restart numbering.
      val k = math.max(
        versions(spark, dir).foldLeft(-1L)(math.max) + 1L,
        m.counter("next_history_version"))
      val vDir = new Path(s"$dir/_history/v=$k")
      fs.mkdirs(vDir)
      touched.foreach { b =>
        val src = new Path(s"$dir/data/bucket=$b")
        val dst = new Path(s"$dir/_history/v=$k/bucket=$b")
        if (fs.exists(src)) fs.rename(src, dst) else fs.mkdirs(dst)
      }
      extra += ("next_history_version" -> (k + 1L).toString)
    } else {
      touched.foreach { b =>
        fs.delete(new Path(s"$dir/data/bucket=$b"), true)
      }
    }
    // install: per-bucket renames from staging into the live table
    stagedBuckets.toSeq.sorted.foreach { b =>
      fs.rename(new Path(s"$staging/data/bucket=$b"),
        new Path(s"$dir/data/bucket=$b"))
    }
    // publish the feed batch only now that the table state it
    // describes is committed
    if (emitFeed) {
      val n = nextBatch(spark, dir, m)
      fs.mkdirs(new Path(s"$dir/feed"))
      fs.rename(new Path(s"$staging/feed"), new Path(s"$dir/feed/batch=$n"))
      extra += ("next_feed_batch" -> (n + 1L).toString)
    }
    fs.delete(new Path(staging), true)

    // widen the meta schema when the changelog introduced columns, so
    // future reads project them (untouched buckets' narrower files
    // null-extend under the explicit read schema). Fields are forced
    // nullable: pre-evolution files genuinely lack the new column.
    val oldFields = m.schema.fieldNames.toSeq
    val schemaJson = if (winners.schema.fieldNames.toSeq != oldFields)
      org.apache.spark.sql.types.StructType(
        winners.schema.fields.map(_.copy(nullable = true))).json
    else m.schema.json
    if (schemaJson != m.schema.json || extra != m.extra)
      writeMeta(spark, dir, key, versionCol, deleteCol, nBuckets,
        schemaJson, extra)
    winners.unpersist()
    if (emitFeed) ranked.unpersist()
    changes.unpersist()
    MergeStats(touched, emptied, rows, feedRows)
  }
}
