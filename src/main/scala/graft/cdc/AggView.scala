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

  private def bucketOf(keys: Seq[org.apache.spark.sql.Column], nBuckets: Int) =
    Bucketing.bucketOf(keys, nBuckets)

  private def keysOf(s: TxLog.Snapshot): Seq[String] =
    Bucketing.decodeKeys(s.props("key"))

  // totals pinned to DECIMAL(28,2): sum() widens decimal precision per
  // aggregation, and a per-merge widening would drift the stored
  // schema across buckets
  private def partials(df: DataFrame, keys: Seq[String], valueCol: String) =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))

  private def coreProps(keys: Seq[String], valueCol: String, nBuckets: Int,
      lastBatchId: Long, schemaJson: String): Map[String, String] = Map(
    "key" -> Bucketing.encodeKeys(keys), "value_col" -> valueCol,
    "n_buckets" -> nBuckets.toString,
    "last_batch_id" -> lastBatchId.toString,
    "schema_json" -> schemaJson)

  def init(df: DataFrame, dir: String, key: String, valueCol: String,
      nBuckets: Int = 256, batchId: Long = -1L): Unit =
    init(df, dir, Seq(key), valueCol, nBuckets, batchId)

  /** Composite-key form (e.g. per `(tenant_id, event_type)` totals):
    * one aggregate row per key TUPLE; see [[Compaction.init]].
    */
  def init(df: DataFrame, dir: String, keys: Seq[String], valueCol: String,
      nBuckets: Int, batchId: Long): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0)
    Bucketing.encodeKeys(keys)
    // the state columns are generated here; a key by these names
    // would be silently clobbered
    keys.foreach(key =>
      require(!Set("cnt", "total", "bucket").contains(key.toLowerCase),
        s"key column '$key' collides with the view's state columns"))
    val fs = TxLog.fs(spark, dir)
    Seq("manifest", "data", ".staging", "meta")
      .foreach(sub => fs.delete(new Path(s"$dir/$sub"), true))
    TxLog.invalidate(dir)
    val txn = new TableTxn(spark, dir, baseVersion = -1L)
    val state = partials(df, keys, valueCol)
      .withColumn("bucket", bucketOf(keys.map(col), nBuckets))
    state
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket") +: keys.map(col): _*)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"${txn.staging}/data")
    val staged = txn.stagedBucketIds()
    txn.installAndCommit(
      staged.map(b => b -> txn.bucketRel(b)).toMap,
      coreProps(keys, valueCol, nBuckets, batchId,
        state.drop("bucket").schema.json))
    txn.cleanup()
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

  /** One key's aggregate row (the dashboard point read) from the
    * single bucket directory that can hold it — O(1 bucket) on a view
    * of any size, same mechanics as [[Compaction.lookup]].
    */
  def lookup(spark: SparkSession, dir: String, keyValue: Any): DataFrame = {
    val s = snap(spark, dir)
    val (keys, nBuckets) = (keysOf(s), s.props("n_buckets").toInt)
    val vals = keyValue match {
      case sq: Seq[_] => sq.toSeq
      case v => Seq(v)
    }
    require(vals.size == keys.size,
      s"key tuple arity ${vals.size} != view key (${keys.mkString(", ")})")
    val bucket = Bucketing.bucketOfValues(vals, nBuckets)
    val paths = s.buckets.get(bucket).toSeq
      .map(rel => s"$dir/data/$rel")
    val schema = schemaOf(s)
    val base = if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
    base.filter(keys.zip(vals).map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _))
  }

  /** Resize the view's bucket count in ONE committed full rewrite —
    * same contract as [[Compaction.rebucket]]: the batch-id fence and
    * version lineage carry, readers never see an intermediate state,
    * racing writers conflict-retry, and a delta merge in flight under
    * the old layout detects the change and restarts re-bucketed.
    */
  def rebucket(spark: SparkSession, dir: String, newNBuckets: Int,
      retainHistory: Boolean = false): Unit = {
    require(newNBuckets > 0, "nBuckets must be positive")
    TxLog.withOcc(spark, dir) {
      val s = snap(spark, dir)
      val (keys, valueCol) = (keysOf(s), s.props("value_col"))
      if (s.props("n_buckets").toInt == newNBuckets) return
      TxLog.sweep(spark, dir)
      val txn = new TableTxn(spark, dir, s.version)
      storedData(spark, dir, s)
        .withColumn("bucket", bucketOf(keys.map(col), newNBuckets))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket") +: keys.map(col): _*)
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"${txn.staging}/data")
      val staged = txn.stagedBucketIds()
      txn.installAndCommit(
        staged.map(b => b -> txn.bucketRel(b)).toMap,
        coreProps(keys, valueCol, newNBuckets,
          s.props("last_batch_id").toLong, s.props("schema_json")))
      TxLog.hygiene {
        txn.cleanup()
        if (!retainHistory) TxLog.vacuum(spark, dir, txn.newVersion)
      }
    }
  }

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
    mergeDeltas(spark, dir,
      partials(batch, keysOf(s), s.props("value_col")),
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
    val (keys, valueCol) = (keysOf(s), s.props("value_col"))
    val sign = when(
        col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(0L)
    val signed = feed.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)") * sign)
          .cast("decimal(28,2)").as("total"))
      // an update whose value did not move is a (0, 0) delta: folding
      // it in would rewrite the key's bucket to state it already holds
      .filter(col("cnt") =!= 0 || coalesce(col("total"), lit(0)) =!= 0)
    mergeDeltas(spark, dir, signed, batchId, canRetract = true)
  }

  private def mergeDeltas(spark: SparkSession, dir: String,
      deltaPartials: DataFrame,
      batchId: Long, canRetract: Boolean): MergeStats = {
    var attempts = 0
    while (true) {
      try return mergeDeltasBucketed(spark, dir, deltaPartials,
        batchId, canRetract)
      catch {
        case _: Compaction.RebucketedDuringWrite if attempts < 3 =>
          attempts += 1
      }
    }
    sys.error("unreachable")
  }

  private def mergeDeltasBucketed(spark: SparkSession, dir: String,
      deltaPartials: DataFrame,
      batchId: Long, canRetract: Boolean): MergeStats = {
    // bucket + cache the delta ONCE; each OCC attempt re-resolves the
    // snapshot AND the fence — a concurrent writer may have applied
    // this very batchId, in which case the retry degrades to the
    // exactly-once no-op; a concurrent rebucket invalidates the cached
    // bucket ids and restarts mergeDeltas wholesale
    val s0 = snap(spark, dir)
    val nBuckets0 = s0.props("n_buckets").toInt
    val delta = deltaPartials
      .withColumn("bucket", bucketOf(keysOf(s0).map(col), nBuckets0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = delta.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      TxLog.withOcc(spark, dir) {
        mergeDeltasOnce(spark, dir, delta, touched, nBuckets0,
          batchId, canRetract)
      }
    } finally delta.unpersist()
  }

  private def mergeDeltasOnce(spark: SparkSession, dir: String,
      delta: DataFrame, touched: Seq[Int], bucketedWith: Int,
      batchId: Long, canRetract: Boolean): MergeStats = {
    val s = snap(spark, dir)
    if (s.props("n_buckets").toInt != bucketedWith)
      throw new Compaction.RebucketedDuringWrite
    if (batchId <= s.props("last_batch_id").toLong)
      return MergeStats(applied = false, Nil)
    val (keys, valueCol, nBuckets) =
      (keysOf(s), s.props("value_col"), s.props("n_buckets").toInt)
    val txn = new TableTxn(spark, dir, s.version)
    var newBuckets = s.buckets
    if (touched.nonEmpty) {
      // crashed-writer leftovers (grace-aware: a LIVE concurrent
      // writer's staging and in-flight generation survive)
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
        .withColumn("bucket", bucketOf(keys.map(col), nBuckets))
        .unionByName(delta)
        .groupBy(col("bucket") +: keys.map(col): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("total")).cast("decimal(28,2)").as("total"))
        // a fully-retracted key (merged count 0) leaves the view;
        // additive-only deltas can't reach 0, so the plain merge path
        // skips the filter
        .filter(!lit(canRetract) || col("cnt") =!= 0)
        .select(keys.map(col) ++ Seq(col("cnt"), col("total"), col("bucket")): _*)
      merged
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket") +: keys.map(col): _*)
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"${txn.staging}/data")
      // a retraction can empty a touched bucket entirely: it staged no
      // partition and simply leaves the bucket map — no stale
      // directory can resurrect its rows because readers only ever
      // resolve manifest-listed paths
      val staged = txn.stagedBucketIds()
      newBuckets = (s.buckets -- touched) ++
        staged.map(b => b -> txn.bucketRel(b))
    }
    // ONE commit publishes the new bucket contents AND the advanced
    // fence — the atomic data+meta write (a no-data batch still
    // commits a manifest: the fence must advance exactly-once too)
    txn.installAndCommit(newBuckets,
      coreProps(keys, valueCol, nBuckets, batchId,
        s.props("schema_json")))
    TxLog.hygiene { txn.cleanup(); TxLog.vacuum(spark, dir, txn.newVersion) }
    MergeStats(applied = true, touched)
  }
}
