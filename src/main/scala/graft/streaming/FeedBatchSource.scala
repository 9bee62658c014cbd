package graft.streaming

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.Replicator

/** True streaming SOURCE over a maintained table's change data feed
  * (r5 verdict item 6): a DataSource-v2 `MicroBatchStream` whose
  * offsets ARE the feed batch ids — checkpointed by the engine,
  * resumed exactly like any other source, and rate-limited with
  * `maxBatchesPerTrigger` — replacing the file-stream wake-up
  * heuristic the previous StreamingReplicator rode.
  *
  * Control/data split, on purpose: the stream emits one row per
  * PUBLISHED feed batch (`batch: long`). The change ROWS themselves
  * are applied by `Replicator.sync` (or read by
  * `Compaction.readFeed(...).filter($"batch" BETWEEN …)`) through the
  * ordinary partition-pruned parquet scan — the fastest path Spark has
  * for bulk data — while the source owns scheduling: discovery of new
  * batches, per-trigger admission, checkpointed progress. Re-emitting
  * the data rows through a hand-rolled `PartitionReader` would
  * re-implement the vectorized parquet reader worse; the feed's row
  * payload already has a first-class batch read.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.FeedBatchSource")
  *     .option("path", tableDir)
  *     .option("maxBatchesPerTrigger", "8")
  *     .load()                       // one row per feed batch id
  * }}}
  *
  * `startingBatch` (default −1 = every published batch) fences where a
  * FRESH checkpoint begins; a resumed checkpoint ignores it, as any
  * source's starting offsets do.
  */
class FeedBatchSource extends TableProvider {

  private def emitRows(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("emitRows")).exists(_.toBoolean)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (emitRows(options))
      StreamingReplicator.feedSchema(SparkSession.active,
          options.get("path"))
        .add("batch", LongType, nullable = false)
    else FeedBatchSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with the caller's original key casing
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft feed source requires .option(\"path\", <table dir>)"))
    new FeedBatchTable(path,
      Option(opts.get("maxBatchesPerTrigger")).map(_.toLong),
      Option(opts.get("startingBatch")).map(_.toLong).getOrElse(-1L),
      emitRows = emitRows(opts),
      rowSchema = if (emitRows(opts)) Some(schema) else None,
      tpPrune = FeedBatchSource.tpPruneOf(path,
        Option(opts.get("timeLowerBound")),
        Option(opts.get("timeUpperBound"))))
  }
}

object FeedBatchSource {
  val Schema: StructType = new StructType().add("batch", LongType,
    nullable = false)

  /** Compile the consumer's `timeLowerBound`/`timeUpperBound` options
    * (timestamp strings, session zone) into the `_tp` admission range
    * for a TIME-PARTITIONED source table — (unit, lo, hi). Pruning is
    * a dir-granularity FILTER on the emitted events (replicate only
    * the last 30 days): skipped partitions' events are never emitted,
    * and the consumer still re-applies its exact row bound. A flat
    * (un-partitioned) table, or a batch published under a DIFFERENT
    * transform unit than the table's current one, is never pruned.
    */
  private[graft] def tpPruneOf(path: String, lower: Option[String],
      upper: Option[String]): Option[(String, Seq[(Int, Int)])] = {
    if (lower.isEmpty && upper.isEmpty) return None
    val unit = graft.cdc.TxLog.latest(SparkSession.active, path)
      .flatMap(_.prop("tp_unit")).getOrElse(return None)
    val lo = lower.map(graft.cdc.Compaction.tpValueOf(unit, _))
      .getOrElse(Int.MinValue)
    val hi = upper.map(graft.cdc.Compaction.tpValueOf(unit, _))
      .getOrElse(Int.MaxValue)
    Some((unit, Seq((lo, hi))))
  }
}

private[streaming] class FeedBatchTable(tableDir: String,
    maxBatchesPerTrigger: Option[Long],
    startingBatch: Long,
    emitRows: Boolean = false,
    rowSchema: Option[StructType] = None,
    tpPrune: Option[(String, Seq[(Int, Int)])] = None)
    extends Table with SupportsRead {

  override def name(): String = s"graft-feed($tableDir)"
  override def schema(): StructType =
    rowSchema.getOrElse(FeedBatchSource.Schema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new FeedBatchStream(tableDir, maxBatchesPerTrigger,
            startingBatch, if (emitRows) rowSchema else None,
            tpPrune = tpPrune)
      }
    }
}

/** Offset = highest feed batch id made visible to the query (−1 before
  * any). Feed publishes are atomic directory renames with a committed
  * monotonic counter, so the id order IS the publish order.
  */
private[graft] case class FeedBatchOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

/** `changelogDeleteCol`: CHANGELOG mode (the catalog's
  * `readStream.table` route) — rows are projected into the TABLE
  * schema, `update_preimage` events are skipped, and the named
  * tombstone column is computed as `_change_type == "delete"`
  * (matching [[graft.cdc.Compaction.feedAsChangelog]]); without it,
  * data-row mode emits the raw feed events including `_change_type`
  * and `batch`.
  */
private[graft] class FeedBatchStream(tableDir: String,
    maxBatchesPerTrigger: Option[Long],
    startingBatch: Long,
    rowSchema: Option[StructType] = None,
    changelogDeleteCol: Option[String] = None,
    spellings: Map[String, Seq[String]] = Map.empty,
    /** (unit, interval union): `_tp` admission for time-bounded
      * consumers of a TIME-PARTITIONED table's feed — from the
      * `timeLowerBound`/`timeUpperBound` options
      * ([[FeedBatchSource.tpPruneOf]]) and/or, on the `t.changes`
      * batch table, pushed filters on the partition source column.
      */
    tpPrune: Option[(String, Seq[(Int, Int)])] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Highest batch id the committed manifest counter has reserved —
    * one (cached) manifest read, no `feed/` listing.
    */
  private def committedHead: Long =
    graft.cdc.TxLog.latest(SparkSession.active, tableDir)
      .map(_.counter("next_feed_batch") - 1L).getOrElse(-1L)

  /** Contiguous-published admission watermark (r9 advice + r10 item):
    * offsets only advance across batch directories VERIFIED to exist,
    * so a committed-but-unpublished batch (a writer that crashed
    * between its commit and the feed publish) blocks the stream AT the
    * gap instead of being silently skipped forever — progress resumes
    * when [[graft.cdc.Compaction.repairFeed]] (or the sweep) finishes
    * the publish. Monotonic, so each trigger probes only the batches
    * beyond it: O(new) existence checks, no per-trigger listing.
    */
  @volatile private var verifiedThrough: Long = Long.MinValue
  @volatile private var lastWarnedGap: Long = Long.MinValue

  private def contiguousHead(from: Long): Long = {
    val spark = SparkSession.active
    val fs = graft.cdc.TxLog.fs(spark, tableDir)
    if (verifiedThrough == Long.MinValue) {
      // first trigger (ONE root listing per stream): don't probe from
      // batch 0 when retention already released a prefix — start at
      // the recorded horizon, or the oldest surviving dir for a
      // legacy table without the marker (pre-marker retention only
      // ever deleted a prefix). The planning fence still throws when
      // `from` itself sits below the jump.
      val (hz, minDir) = graft.cdc.Compaction.feedFloor(spark, tableDir)
      verifiedThrough = math.max(from,
        (if (hz > 0L) hz else minDir.getOrElse(0L)) - 1L)
    }
    val cap = committedHead
    var h = math.max(verifiedThrough, from)
    while (h < cap && fs.exists(new org.apache.hadoop.fs.Path(
        s"$tableDir/feed/batch=${h + 1}"))) h += 1
    verifiedThrough = h
    if (h < cap && lastWarnedGap != h + 1) {
      lastWarnedGap = h + 1
      log.warn(s"feed batch ${h + 1} of $tableDir is committed but " +
        "not published (writer crashed between commit and publish?); " +
        "the stream holds at the gap until " +
        "graft.cdc.Compaction.repairFeed republishes it")
    }
    h
  }

  /** Memoized per-batch file listings: batches are immutable once
    * published, so a re-planned offset range (task retry, restart
    * replay) re-uses the first listing. `listings` counts physical
    * listings for the one-listing-per-batch-lifetime spec.
    */
  private val fileCache =
    scala.collection.concurrent.TrieMap.empty[Long, Seq[FeedFilePartition]]
  private[streaming] val listings =
    new java.util.concurrent.atomic.AtomicLong

  /** Trigger.AvailableNow: fix the drain target at query start so the
    * run terminates even while a writer keeps publishing — WITHOUT
    * this, Spark silently degrades AvailableNow to one unbounded batch
    * and the per-trigger rate limit never applies.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(committedHead)

  override def initialOffset(): Offset = FeedBatchOffset(startingBatch)

  override def deserializeOffset(json: String): Offset =
    FeedBatchOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxBatchesPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: advance at most `maxBatchesPerTrigger` feed
    * batches per micro-batch (each emitted row is one feed batch, so
    * the engine's maxRows limit maps 1:1).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FeedBatchOffset].batch
    val pub = contiguousHead(from)
    val h = availableNowTarget.map(t => math.min(t, pub)).getOrElse(pub)
    val capped = maxBatchesPerTrigger match {
      case Some(n) => math.min(h, from + n)
      case None => h
    }
    FeedBatchOffset(math.max(from, capped))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset = FeedBatchOffset(committedHead)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[FeedBatchOffset].batch
    val to = end.asInstanceOf[FeedBatchOffset].batch
    if (to <= from) Array.empty
    else rowSchema match {
      case None => Array(FeedBatchRange(from + 1, to))
      case Some(_) =>
        // data-row mode: one partition per published file of the
        // admitted batch range — parallelism follows the feed layout.
        // Batch listings memoize (immutable once published) and the
        // retention horizon is a committed property, so a steady-state
        // trigger performs NO `feed/` listing at all (r9 advice: this
        // re-listed the root plus every admitted dir per trigger).
        val spark = SparkSession.active
        val fs = graft.cdc.TxLog.fs(spark, tableDir)
        if (fileCache.size > 8192) fileCache.clear()
        (from + 1 to to).flatMap { b =>
          fileCache.getOrElseUpdate(b, listBatch(spark, fs, b, from))
        }.toArray
    }
  }

  /** One physical listing of a published batch dir. A MISSING dir is
    * never silently skipped (both failures below used to yield `Nil`,
    * i.e. permanent silent divergence):
    *  - below the retention horizon → the Kafka OffsetOutOfRange
    *    contract: re-seed from a snapshot and fence with
    *    `.option("startingBatch", <horizon - 1>)`;
    *  - at or above it → a lost publish (writer crashed between commit
    *    and feed publish) or an out-of-band delete; repairFeed is the
    *    remediation. Contiguous admission makes this unreachable for
    *    fresh offsets — it guards ranges admitted by old checkpoints.
    */
  private def listBatch(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, b: Long,
      from: Long): Seq[FeedFilePartition] = {
    val d = new org.apache.hadoop.fs.Path(s"$tableDir/feed/batch=$b")
    if (!fs.exists(d)) {
      val (hz, minDir) = graft.cdc.Compaction.feedFloor(spark, tableDir)
      // with a recorded horizon, only ids below it are retention; a
      // legacy table's prefix-below-oldest-dir is assumed retention
      // (no dirs at all ⇒ the committed counter says batches ≤ b were
      // published but every dir is gone — whole range below horizon)
      val mn = if (hz > 0L) hz else minDir.getOrElse(b + 1L)
      if (b < mn) throw new IllegalStateException(
        s"feed batches ${from + 1}..${mn - 1} of $tableDir were " +
          "removed by retention (maintain maxFeedAge); resuming " +
          "here would silently skip their changes — re-seed the " +
          "consumer from a table snapshot and restart with " +
          s".option(\"startingBatch\", ${mn - 1})")
      throw new IllegalStateException(
        s"feed batch $b of $tableDir is committed but its directory " +
          "is missing: a writer crashed between its commit and the " +
          "feed publish (run graft.cdc.Compaction.repairFeed to " +
          "finish the publish from its staging) or the directory was " +
          "deleted outside retention; proceeding would silently skip " +
          "its changes")
    }
    listings.incrementAndGet()
    val top = fs.listStatus(d).toSeq
    // time-partitioned feed batches nest one `_tp=` level; a
    // time-bounded consumer skips out-of-range partition dirs by NAME
    // — but ONLY when the batch's publish marker records the same
    // transform unit the bounds were computed in (a partition-spec
    // evolution in between would change the dirs' meaning)
    val unit = graft.cdc.Compaction.batchTpUnit(
      top.map(_.getPath.getName))
    val admit: Int => Boolean = tpPrune match {
      case Some((u, ivs)) if unit.contains(u) =>
        n => graft.cdc.Compaction.tpAdmits(ivs, n)
      case _ => _ => true
    }
    top.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("_tp=")) {
        if (admit(graft.cdc.Compaction.tpDirValue(n)))
          fs.listStatus(st.getPath).toSeq
        else Nil
      } else Seq(st)
    }
      .filter(st => st.getPath.getName.startsWith("part-") &&
        st.getLen > 0)
      .map(st => FeedFilePartition(st.getPath.toString, st.getLen, b))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    rowSchema match {
      case None => FeedBatchReaderFactory
      case Some(schema) =>
        // mirror the conf keys Spark's own parquet read path injects
        // (newHadoopConf copies only EXPLICITLY-set SQL confs; the
        // schema converter reads these raw and NPEs on absence)
        val spark = SparkSession.active
        val sqlc = spark.sessionState.conf
        val hc = spark.sessionState.newHadoopConf()
        import org.apache.spark.sql.internal.SQLConf
        hc.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
          sqlc.getConf(SQLConf.PARQUET_BINARY_AS_STRING))
        hc.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
          sqlc.getConf(SQLConf.PARQUET_INT96_AS_TIMESTAMP))
        hc.setBoolean(SQLConf.CASE_SENSITIVE.key,
          sqlc.getConf(SQLConf.CASE_SENSITIVE))
        hc.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
          sqlc.getConf(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED))
        hc.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
          sqlc.getConf(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG))
        hc.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
          sqlc.getConf(SQLConf.PARQUET_FIELD_ID_READ_ENABLED))
        hc.set("parquet.read.support.class",
          "org.apache.spark.sql.execution.datasources.parquet" +
            ".ParquetReadSupport")
        new FeedRowReaderFactory(schema,
          new org.apache.spark.util.SerializableConfiguration(hc),
          changelogDeleteCol, spellings)
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] case class FeedBatchRange(first: Long, last: Long)
  extends InputPartition

private[streaming] object FeedBatchReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FeedBatchRange]
    new PartitionReader[InternalRow] {
      private var current = r.first - 1
      override def next(): Boolean = { current += 1; current <= r.last }
      override def get(): InternalRow = InternalRow(current)
      override def close(): Unit = ()
    }
  }
}

private[graft] case class FeedFilePartition(path: String, len: Long,
    batch: Long) extends InputPartition

/** Data-row mode reader: one published feed parquet file per
  * partition, read through Spark's own vectorized parquet reader (the
  * same kernel the batch path uses — no hand-rolled decoder), each
  * row projected BY NAME into the declared read schema (older batches
  * written before a schema evolution null-extend) with the batch id
  * appended. Files are immutable once published, so a replayed offset
  * range re-reads byte-identical data — exactly-once downstream under
  * the engine's offset checkpointing.
  */
private[streaming] final class FeedRowReaderFactory(
    readSchema: StructType,
    hadoopConf: org.apache.spark.util.SerializableConfiguration,
    changelogDeleteCol: Option[String] = None,
    // logical column (lowercase) -> its historical spellings, newest
    // first: feed files published before an ALTER RENAME carry the
    // old name, and by-name projection alone would null them out
    spellings: Map[String, Seq[String]] = Map.empty)
    extends PartitionReaderFactory {

  private def spellingsOf(name: String): Seq[String] =
    spellings.getOrElse(name.toLowerCase, Seq(name))

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FeedFilePartition]
    new PartitionReader[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

      // the SESSION's Hadoop configuration, shipped with the factory:
      // a bare `new Configuration()` here would lose fs credentials /
      // scheme registrations and strand the stream on local fs
      private val conf =
        new org.apache.hadoop.conf.Configuration(hadoopConf.value)
      private val path = new org.apache.hadoop.fs.Path(p.path)
      private val reader =
        new org.apache.spark.sql.execution.datasources.parquet
          .VectorizedParquetRecordReader(false, 4096)
      // footer read once (session-conf filesystem): field names for
      // the by-name projection + the file's own Spark schema for the
      // record reader's requested-schema contract
      private val fileFields: Seq[String] = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          path, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val msg = r.getFooter.getFileMetaData.getSchema
          val sparkFileSchema =
            new org.apache.spark.sql.execution.datasources.parquet
              .ParquetToSparkSchemaConverter(conf).convert(msg)
          // request the READ schema's type wherever it is a legal
          // widening of the file's (feed files written before an
          // ALTER COLUMN widen carry the narrow type; the vectorized
          // reader widens INT32->Long etc. in place) — requesting the
          // file's own type would hand back values the projection
          // below cannot carry into the declared read schema
          val requested = StructType(sparkFileSchema.fields.map { f =>
            // resolve through historical spellings too: a column both
            // renamed AND widened matches its read field by OLD name
            readSchema.fields.find(rf => spellingsOf(rf.name)
              .exists(_.equalsIgnoreCase(f.name))) match {
              case Some(rf) if rf.dataType != f.dataType &&
                  graft.cdc.Compaction.canWiden(f.dataType, rf.dataType) =>
                f.copy(dataType = rf.dataType)
              case _ => f
            }
          })
          // the stable key ParquetReadSupport reads the requested
          // schema from (same constant across Spark 3.x/4.x)
          conf.set("org.apache.spark.sql.parquet.row.requested_schema",
            requested.json)
          val fields = msg.getFields
          (0 until fields.size).map(i => fields.get(i).getName)
        } finally r.close()
      }
      reader.initialize(
        new org.apache.hadoop.mapred.FileSplit(
          path, 0, p.len, Array.empty[String]),
        new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf, new org.apache.hadoop.mapreduce.TaskAttemptID()))
      // data columns resolve by name — through historical spellings
      // for renamed columns — and the trailing `batch` column (plus
      // any evolved-in column the file predates) yields null/literal
      private val mapping: Array[Int] =
        readSchema.fieldNames.map { n =>
          spellingsOf(n).iterator
            .map(s => fileFields.indexWhere(_.equalsIgnoreCase(s)))
            .find(_ >= 0).getOrElse(-1)
        }
      // changelog mode: _change_type read from the file (never part
      // of readSchema there), preimages skipped, tombstone computed
      private val ctIdx: Int =
        if (changelogDeleteCol.isEmpty) -1
        else {
          val i = fileFields.indexOf("_change_type")
          if (i < 0) throw new IllegalStateException(
            s"feed file ${p.path} lacks _change_type")
          i
        }
      private val Preimage =
        org.apache.spark.unsafe.types.UTF8String
          .fromString("update_preimage")
      private val Delete =
        org.apache.spark.unsafe.types.UTF8String.fromString("delete")
      private var pendingDelete = false

      override def next(): Boolean = {
        if (ctIdx < 0) return reader.nextKeyValue()
        while (reader.nextKeyValue()) {
          val v = reader.getCurrentValue.asInstanceOf[InternalRow]
          val ct = v.getUTF8String(ctIdx)
          if (ct == null || !ct.equals(Preimage)) {
            pendingDelete = ct != null && ct.equals(Delete)
            return true
          }
        }
        false
      }

      // fields whose vectorized-reader values are VIEWS over the column
      // vectors (UTF8String, nested array/map/struct): the projection
      // reads every field before the next nextKeyValue(), but
      // GenericInternalRow.copy() is SHALLOW — a consumer retaining
      // rows via copy() (buffering operators on interpreted paths)
      // would observe them silently mutate when the reader loads the
      // next 4096-row page. Copy exactly those kinds; fixed-width
      // primitives (and getBinary, which already allocates) stay on
      // the cheap path.
      private val needsCopy: Array[Boolean] = readSchema.fields.map {
        f => f.dataType match {
          case org.apache.spark.sql.types.StringType => true
          case _: org.apache.spark.sql.types.ArrayType => true
          case _: org.apache.spark.sql.types.MapType => true
          case _: org.apache.spark.sql.types.StructType => true
          case _ => false
        }
      }

      private def owned(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case o => o
      }

      override def get(): InternalRow = {
        val src = reader.getCurrentValue.asInstanceOf[InternalRow]
        val out = new Array[Any](readSchema.length)
        var i = 0
        while (i < readSchema.length) {
          val f = readSchema.fields(i)
          out(i) =
            if (f.name == "batch" && ctIdx < 0) p.batch
            // changelog mode: `_order` = publish order = feed batch id
            // (the catalog's metadata column; see GraftScan scaladoc)
            else if (f.name == "_order" && ctIdx >= 0) p.batch
            else if (changelogDeleteCol.exists(_.equalsIgnoreCase(f.name)))
              pendingDelete
            else {
              val j = mapping(i)
              if (j < 0 || src.isNullAt(j)) null
              else if (needsCopy(i)) owned(src.get(j, f.dataType))
              else src.get(j, f.dataType)
            }
          i += 1
        }
        new GenericInternalRow(out)
      }

      override def close(): Unit = reader.close()
    }
  }
}
