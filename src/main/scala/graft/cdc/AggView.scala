package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view — the third member of the
  * maintained-table family (latest state = [[Compaction]], history =
  * [[Scd2]], aggregates = this): a per-key (count, sum) table that
  * absorbs delta batches WITHOUT rescanning history, with the same
  * hash-bucketed layout and partition-pruned rewrites.
  *
  * Count and sum are the canonical ALGEBRAIC aggregates: a batch
  * collapses to per-key partials (map-side combined), and merging is
  * pointwise addition on the <= one-row-per-key state — avg/rate
  * derive downstream. Deltas are additive; model an update as a
  * retraction pair (negative delta) if the source emits them.
  *
  * Exactly-once: merges are NOT idempotent (addition), so the meta
  * records the last applied `batchId` and [[merge]] refuses ids
  * <= it. foreachBatch's dominant failure mode — the batch completed
  * but the checkpoint didn't commit, so the SAME id is re-presented —
  * becomes a no-op. The remaining window is a crash BETWEEN the data
  * write and the meta write inside one merge (data applied, fence not
  * advanced → that one replay double-counts): closing it needs an
  * atomic data+meta commit (a transaction log à la Delta/Iceberg),
  * which is out of scope here and stated rather than papered over.
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

  def init(df: DataFrame, dir: String, key: String, valueCol: String,
      nBuckets: Int = 256, batchId: Long = -1L): Unit = {
    val spark = df.sparkSession
    require(nBuckets > 0)
    // the state columns are generated here; a key by these names
    // would be silently clobbered
    require(!Set("cnt", "total", "bucket").contains(key.toLowerCase),
      s"key column '$key' collides with the view's state columns")
    val state = partials(df, key, valueCol)
      .withColumn("bucket", bucketOf(col(key), nBuckets))
    state
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.partitionBy("bucket").mode("overwrite")
      // a session-wide dynamic default would leave a previous
      // incarnation's extra bucket dirs alive — re-init is a replace
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/data")
    // schema in meta: a fully-retracted view has no footers left to
    // infer from, and reads must stay well-defined on the empty dir
    writeMeta(spark, dir, key, valueCol, nBuckets, batchId,
      Some(state.schema.json))
  }

  // driver-side properties file (see MetaFile): the fence advance on
  // EVERY merge used to be a Spark write job; now it's a byte-sized
  // FileSystem stream
  private def writeMeta(spark: SparkSession, dir: String, key: String,
      valueCol: String, nBuckets: Int, lastBatchId: Long,
      schemaJson: Option[String] = None): Unit =
    MetaFile.write(spark, dir, Map(
      "key" -> key, "value_col" -> valueCol,
      "n_buckets" -> nBuckets.toString,
      "last_batch_id" -> lastBatchId.toString) ++
      schemaJson.map("schema_json" -> _))

  def readMeta(spark: SparkSession, dir: String): (String, String, Int, Long) = {
    val m = MetaFile.read(spark, dir)
    (m("key"), m("value_col"), m("n_buckets").toInt,
      m("last_batch_id").toLong)
  }

  private def storedSchema(spark: SparkSession, dir: String)
      : Option[org.apache.spark.sql.types.StructType] =
    MetaFile.read(spark, dir).get("schema_json").map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  private def storedData(spark: SparkSession, dir: String): DataFrame =
    storedSchema(spark, dir) match {
      // explicit schema: an empty (fully-retracted) data dir must not
      // throw on inference — pre-schema_json tables fall back
      case Some(s) => spark.read.schema(s).parquet(s"$dir/data")
      case None => spark.read.parquet(s"$dir/data")
    }

  def read(spark: SparkSession, dir: String): DataFrame =
    storedData(spark, dir).drop("bucket")

  /** Fold one delta batch in. Returns applied=false (and touches
    * nothing) when `batchId` was already applied — the exactly-once
    * fence for at-least-once callers. Pass monotonically increasing
    * ids (foreachBatch's id works as-is).
    */
  def merge(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): MergeStats = {
    val (key, valueCol, nBuckets, lastId) = readMeta(spark, dir)
    if (batchId <= lastId) return MergeStats(applied = false, Nil)
    mergeDeltas(spark, dir, partials(batch, key, valueCol),
      key, valueCol, nBuckets, batchId, canRetract = false)
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
    * that way has its directory removed, same rule as Compaction).
    */
  def applyFeed(spark: SparkSession, dir: String, feed: DataFrame,
      batchId: Long): MergeStats = {
    val (key, valueCol, nBuckets, lastId) = readMeta(spark, dir)
    if (batchId <= lastId) return MergeStats(applied = false, Nil)
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
    mergeDeltas(spark, dir, signed, key, valueCol, nBuckets, batchId,
      canRetract = true)
  }

  private def mergeDeltas(spark: SparkSession, dir: String,
      deltaPartials: DataFrame, key: String, valueCol: String,
      nBuckets: Int, batchId: Long, canRetract: Boolean): MergeStats = {
    val delta = deltaPartials
      .withColumn("bucket", bucketOf(col(key), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = delta.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.nonEmpty) {
      val stored = storedData(spark, dir)
        .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      val merged0 = stored.unionByName(delta)
        .groupBy(col("bucket"), col(key))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("total")).cast("decimal(28,2)").as("total"))
        // a fully-retracted key (merged count 0) leaves the view;
        // additive-only deltas can't reach 0, so the plain merge path
        // skips the filter and the emptied-bucket accounting below
        .filter(!lit(canRetract) || col("cnt") =!= 0)
        .select(col(key), col("cnt"), col("total"), col("bucket"))
      val merged = if (canRetract)
        merged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else merged0
      merged
        .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
        .write.partitionBy("bucket").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$dir/data")
      if (canRetract) {
        // retractions can empty a touched bucket entirely; dynamic
        // overwrite then wrote no partition for it and the stale
        // directory would resurrect the rows on read
        val stillPresent = merged.select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSet
        merged.unpersist()
        val emptied = touched.filterNot(stillPresent)
        if (emptied.nonEmpty) {
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          emptied.foreach { b =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$dir/data/bucket=$b"), true)
          }
        }
      }
    }
    delta.unpersist()
    // fence advance preserves the stored schema (MetaFile overwrites
    // the whole map)
    writeMeta(spark, dir, key, valueCol, nBuckets, batchId,
      storedSchema(spark, dir).map(_.json))
    MergeStats(applied = true, touched)
  }
}
