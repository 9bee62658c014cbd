package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view — the third member of the
  * maintained-table family (latest state = [[Compaction]], history =
  * [[Scd2]], aggregates = this): a per-key (count, sum) table that
  * absorbs delta batches WITHOUT rescanning history, with the same
  * hash-bucketed layout and path-pruned rewrites.
  *
  * Count and sum are the canonical ALGEBRAIC aggregates: a batch
  * collapses to per-key partials (map-side combined), and merging is
  * pointwise addition on the <= one-row-per-key state — avg/rate
  * derive downstream. Deltas are additive; model an update as a
  * retraction pair (negative delta) if the source emits them.
  *
  * Exactly-once: merges are NOT idempotent (addition), so the manifest
  * records the last applied `batchId` and [[merge]] refuses ids
  * <= it. foreachBatch's dominant failure mode — the batch completed
  * but the checkpoint didn't commit, so the SAME id is re-presented —
  * becomes a no-op. The fence and the data commit are ONE atomic
  * manifest rename (see [[TxLog]]): a crash between the bucket write
  * and the commit leaves both the data and the fence at the previous
  * batch, so the replay applies exactly once — the double-count window
  * the previous separate data/meta writes had is closed (verified by
  * the crash-injection AtomicCommitSpec).
  */
object AggView {

  final case class MergeStats(applied: Boolean, touchedBuckets: Seq[Int])

  private def bucketOf(key: org.apache.spark.sql.Column, nBuckets: Int) =
    Bucketing.bucketOf(key, nBuckets)

  // totals pinned to DECIMAL(28,2): sum() widens decimal precision per
  // aggregation, and a per-merge widening would drift the stored
  // schema across buckets
  private def partials(df: DataFrame, key: String, valueCol: String) =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))

  private def coreProps(key: String, valueCol: String, nBuckets: Int,
      lastBatchId: Long, schemaJson: String): Map[String, String] = Map(
    "key" -> key, "value_col" -> valueCol,
    "n_buckets" -> nBuckets.toString,
    "last_batch_id" -> lastBatchId.toString,
    "schema_json" -> schemaJson)

  def init(df: DataFrame, dir: String, key: String, valueCol: String,
      nBuckets: Int = 256, batchId: Long = -1L): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0)
    // the state columns are generated here; a key by these names
    // would be silently clobbered
    require(!Set("cnt", "total", "bucket").contains(key.toLowerCase),
      s"key column '$key' collides with the view's state columns")
    val fs = TxLog.fs(spark, dir)
    Seq("manifest", "data", ".staging", "meta")
      .foreach(sub => fs.delete(new Path(s"$dir/$sub"), true))
    val state = partials(df, key, valueCol)
      .withColumn("bucket", bucketOf(col(key), nBuckets))
    state
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/.staging/data")
    val staged = stagedBucketIds(fs, dir)
    installAndCommit(spark, dir, 0L,
      staged.map(b => b -> s"g0/bucket=$b").toMap,
      coreProps(key, valueCol, nBuckets, batchId,
        state.drop("bucket").schema.json))
    fs.delete(new Path(s"$dir/.staging"), true)
  }

  private def stagedBucketIds(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Int] = {
    val p = new Path(s"$dir/.staging/data")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("bucket=") => s.drop(7).toInt }
  }

  private def installAndCommit(spark: SparkSession, dir: String,
      version: Long, newBuckets: Map[Int, String],
      props: Map[String, String]): Unit = {
    val fs = TxLog.fs(spark, dir)
    val stagedData = new Path(s"$dir/.staging/data")
    if (fs.exists(stagedData)) {
      fs.mkdirs(new Path(s"$dir/data"))
      val dst = new Path(s"$dir/data/g$version")
      require(fs.rename(stagedData, dst),
        s"install rename failed: $stagedData -> $dst")
    }
    TxLog.commit(spark, dir, version, props ++ TxLog.bucketProps(newBuckets))
  }

  private def snap(spark: SparkSession, dir: String): TxLog.Snapshot =
    TxLog.latest(spark, dir).getOrElse(throw new
      IllegalArgumentException(s"no committed manifest under $dir"))

  def readMeta(spark: SparkSession, dir: String): (String, String, Int, Long) = {
    val s = snap(spark, dir)
    (s.props("key"), s.props("value_col"), s.props("n_buckets").toInt,
      s.props("last_batch_id").toLong)
  }

  private def schemaOf(s: TxLog.Snapshot) =
    org.apache.spark.sql.types.DataType.fromJson(s.props("schema_json"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  private def storedData(spark: SparkSession, dir: String,
      s: TxLog.Snapshot): DataFrame = {
    val schema = schemaOf(s)
    val paths = s.buckets.values.map(rel => s"$dir/data/$rel").toSeq
    // explicit schema: a fully-retracted view has no footers left to
    // infer from, and reads must stay well-defined with zero live paths
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    storedData(spark, dir, snap(spark, dir))

  /** Fold one delta batch in. Returns applied=false (and touches
    * nothing) when `batchId` was already applied — the exactly-once
    * fence for at-least-once callers. Pass monotonically increasing
    * ids (foreachBatch's id works as-is).
    */
  def merge(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): MergeStats = {
    val s = snap(spark, dir)
    if (batchId <= s.props("last_batch_id").toLong)
      return MergeStats(applied = false, Nil)
    mergeDeltas(spark, dir, s,
      partials(batch, s.props("key"), s.props("value_col")),
      batchId, canRetract = false)
  }

  /** Incremental view maintenance over a [[Compaction]] change data
    * feed: each feed event becomes a SIGNED delta — `insert` and
    * `update_postimage` add the row (+1, +value), `delete` and
    * `update_preimage` retract it (−1, −value) — so after applying
    * every feed batch the view equals a from-scratch aggregation of
    * the live table. This is the classic retraction-pair IVM plan the
    * object doc promises: the maintained table emits its own deltas,
    * and downstream aggregates never rescan it. `feed` must carry the
    * view's key and value columns plus `_change_type`; a key whose
    * merged count reaches zero leaves the view (and a bucket emptied
    * that way leaves the manifest's bucket map, same rule as
    * Compaction).
    */
  def applyFeed(spark: SparkSession, dir: String, feed: DataFrame,
      batchId: Long): MergeStats = {
    val s = snap(spark, dir)
    if (batchId <= s.props("last_batch_id").toLong)
      return MergeStats(applied = false, Nil)
    val (key, valueCol) = (s.props("key"), s.props("value_col"))
    val sign = when(
        col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(0L)
    val signed = feed.groupBy(col(key))
      .agg(sum(sign).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)") * sign)
          .cast("decimal(28,2)").as("total"))
      // an update whose value did not move is a (0, 0) delta: folding
      // it in would rewrite the key's bucket to state it already holds
      .filter(col("cnt") =!= 0 || coalesce(col("total"), lit(0)) =!= 0)
    mergeDeltas(spark, dir, s, signed, batchId, canRetract = true)
  }

  private def mergeDeltas(spark: SparkSession, dir: String,
      s: TxLog.Snapshot, deltaPartials: DataFrame,
      batchId: Long, canRetract: Boolean): MergeStats = {
    val (key, valueCol, nBuckets) =
      (s.props("key"), s.props("value_col"), s.props("n_buckets").toInt)
    val fs = TxLog.fs(spark, dir)
    val delta = deltaPartials
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = delta.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val newVersion = s.version + 1L
    var newBuckets = s.buckets
    if (touched.nonEmpty) {
      // crashed-writer leftovers must go before our install rename
      fs.delete(new Path(s"$dir/.staging"), true)
      TxLog.sweep(spark, dir)
      val touchedPaths = s.buckets.view
        .filterKeys(touched.toSet).values.map(rel => s"$dir/data/$rel").toSeq
      val schema = schemaOf(s)
      val stored =
        if (touchedPaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(touchedPaths: _*)
      val merged = stored
        .withColumn("bucket", bucketOf(col(key), nBuckets))
        .unionByName(delta)
        .groupBy(col("bucket"), col(key))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("total")).cast("decimal(28,2)").as("total"))
        // a fully-retracted key (merged count 0) leaves the view;
        // additive-only deltas can't reach 0, so the plain merge path
        // skips the filter
        .filter(!lit(canRetract) || col("cnt") =!= 0)
        .select(col(key), col("cnt"), col("total"), col("bucket"))
      merged
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), col(key))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$dir/.staging/data")
      // a retraction can empty a touched bucket entirely: it staged no
      // partition and simply leaves the bucket map — no stale
      // directory can resurrect its rows because readers only ever
      // resolve manifest-listed paths
      val staged = stagedBucketIds(fs, dir)
      newBuckets = (s.buckets -- touched) ++
        staged.map(b => b -> s"g$newVersion/bucket=$b")
    }
    // ONE commit publishes the new bucket contents AND the advanced
    // fence — the atomic data+meta write (a no-data batch still
    // commits a manifest: the fence must advance exactly-once too)
    installAndCommit(spark, dir, newVersion, newBuckets,
      coreProps(key, valueCol, nBuckets, batchId,
        s.props("schema_json")))
    fs.delete(new Path(s"$dir/.staging"), true)
    TxLog.vacuum(spark, dir, newVersion)
    delta.unpersist()
    MergeStats(applied = true, touched)
  }
}
