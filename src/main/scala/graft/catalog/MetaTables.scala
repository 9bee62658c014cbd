package graft.catalog

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{Compaction, Replicator, TxLog}

/** Metadata tables for maintained tables, the Iceberg-style inspection
  * surface (cf. iceberg `db.t.files` / `db.t.history`): for a catalog
  * table `graft.ns.t`,
  *
  *  - `graft.ns.t.history`    — one row per retained commit
  *  - `graft.ns.t.files`      — one row per live data file
  *  - `graft.ns.t.partitions` — one row per live `_tp=` partition
  *  - `graft.ns.t.changes`    — the change data feed as a BATCH table
  *
  * each also reachable as `` `t$history` `` etc. (the Delta-style
  * suffix spelling). The first three are driver-computed metadata —
  * manifest reads plus pooled directory listings, ZERO Spark jobs at
  * plan time, served through DSv2 [[LocalScan]] (row counts are
  * O(commits / files / partitions), the same orders the scan planner
  * itself materializes). `changes` is a real distributed scan: the
  * published feed read through the SAME vectorized per-file reader the
  * changelog stream uses ([[graft.streaming.FeedBatchStream]] data-row
  * mode — schema-evolution spellings, memoized batch listings, `_tp`
  * admission), with `batch` predicates pushed down to BATCH-DIRECTORY
  * pruning (reading "changes since batch k" lists and opens only
  * `batch>k` dirs — O(selected), never O(feed)).
  */
private[graft] object MetaTables {

  val Names: Set[String] = Set("history", "files", "partitions", "changes")

  def table(kind: String, fullName: String, dir: String): Table =
    kind match {
      case "changes" => new GraftChangesTable(fullName, dir)
      case k => new GraftLocalMetaTable(fullName, dir, k)
    }

  private[catalog] def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** The wall-clock start of partition value `n` under `unit`, as
    * Catalyst micros — the inverse of [[Compaction.tpValueOf]]'s floor
    * (days/hours divide the epoch directly; months/years are calendar
    * fields in the session zone, matching the write side).
    */
  /** (bucket, kind, tp, status) for every live data file — ONE pooled
    * leaf listing over every base + delta dir of the current snapshot.
    * Shared by the `files`/`partitions` metadata tables and the
    * `SHOW FILES` / `SHOW PARTITIONS` SQL verbs.
    */
  private[graft] def fileEntries(spark: SparkSession, dir: String)
      : Seq[(Int, String, Option[Int],
          org.apache.hadoop.fs.FileStatus)] = {
    val m = ScanMeta.load(spark, dir, None)
    val fs = TxLog.fs(spark, dir)
    val roots: Seq[(Int, String, Path)] =
      m.buckets.toSeq.sortBy(_._1).map { case (b, rel) =>
        (b, "base", new Path(s"$dir/data/$rel")) } ++
      m.deltas.toSeq.sortBy(_._1).flatMap { case (b, rels) =>
        rels.map(rel => (b, "delta", new Path(s"$dir/data/$rel"))) }
    Compaction.listTpLeaves(fs, roots.map(_._3)).zip(roots).flatMap {
      case ((_, leaves), (b, k, _)) =>
        leaves.filter(st => st.isFile &&
            !st.getPath.getName.startsWith(".") &&
            !st.getPath.getName.startsWith("_"))
          .map { st =>
            val parent = st.getPath.getParent.getName
            val tp = if (parent.startsWith("_tp="))
              Some(Compaction.tpDirValue(parent)) else None
            (b, k, tp, st)
          }
    }
  }

  /** Per-partition rollup of [[fileEntries]]: (tp, unit, files, bytes,
    * buckets) — empty for a flat table.
    */
  private[graft] def partitionEntries(spark: SparkSession, dir: String)
      : Seq[(Int, String, Long, Long, Int)] =
    TxLog.latest(spark, dir).flatMap(_.prop("tp_unit")) match {
      case None => Nil
      case Some(unit) =>
        fileEntries(spark, dir)
          .collect { case (b, _, Some(tp), st) => (tp, b, st.getLen) }
          .groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (tp, group) =>
            (tp, unit, group.size.toLong, group.map(_._3).sum,
              group.map(_._2).distinct.size)
          }
    }

  private[graft] def tpStartMicros(unit: String, n: Int): Long = {
    val zone = java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val instant = unit match {
      case "days" => java.time.Instant.ofEpochSecond(n * 86400L)
      case "hours" => java.time.Instant.ofEpochSecond(n * 3600L)
      case "months" =>
        java.time.LocalDate.of(1970 + Math.floorDiv(n, 12),
          Math.floorMod(n, 12) + 1, 1).atStartOfDay(zone).toInstant
      case "years" =>
        java.time.LocalDate.of(1970 + n, 1, 1)
          .atStartOfDay(zone).toInstant
      case u => throw new IllegalArgumentException(
        s"unsupported time-partition transform '$u'")
    }
    Math.multiplyExact(instant.getEpochSecond, 1000000L) +
      instant.getNano / 1000L
  }
}

/** Driver-computed metadata table (`history` / `files` / `partitions`)
  * over one maintained table's manifest + directory layout.
  */
private[catalog] final class GraftLocalMetaTable(fullName: String,
    dir: String, kind: String) extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = fullName

  override def schema(): StructType = kind match {
    case "history" => new StructType()
      .add("version", LongType, nullable = false)
      .add("committed_at", TimestampType, nullable = false)
      .add("operation", StringType, nullable = false)
      .add("txn_id", StringType)
      .add("base_txn", StringType)
      .add("live_rows", LongType, nullable = false)
      .add("dirty_buckets", IntegerType, nullable = false)
    case "files" => new StructType()
      .add("bucket", IntegerType, nullable = false)
      .add("kind", StringType, nullable = false) // base | delta
      .add("partition", IntegerType) // `_tp` value; null when flat
      .add("path", StringType, nullable = false)
      .add("size_bytes", LongType, nullable = false)
      .add("modified_at", TimestampType, nullable = false)
    case "partitions" => new StructType()
      .add("partition", IntegerType, nullable = false)
      .add("starts_at", TimestampType, nullable = false)
      .add("unit", StringType, nullable = false)
      .add("files", LongType, nullable = false)
      .add("size_bytes", LongType, nullable = false)
      .add("buckets", IntegerType, nullable = false)
    case k => throw new IllegalArgumentException(s"unknown meta table $k")
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val s = schema()
    () => new LocalScan {
      override def readSchema(): StructType = s
      override def rows(): Array[InternalRow] = computeRows()
      override def description(): String = s"graft-meta($fullName)"
    }
  }

  private def computeRows(): Array[InternalRow] = kind match {
    case "history" =>
      Compaction.historyRows(spark, dir).map {
        case (v, ms, op, txn, base, liveRows, dirty) =>
          new GenericInternalRow(Array[Any](v, ms * 1000L,
            MetaTables.utf8(op), txn.map(MetaTables.utf8).orNull,
            base.map(MetaTables.utf8).orNull, liveRows, dirty))
            : InternalRow
      }.toArray
    case "files" =>
      MetaTables.fileEntries(spark, dir).map { case (b, k, tp, st) =>
        new GenericInternalRow(Array[Any](b, MetaTables.utf8(k),
          tp.map(Int.box).orNull,
          MetaTables.utf8(st.getPath.toString), st.getLen,
          st.getModificationTime * 1000L)): InternalRow
      }.toArray
    case "partitions" =>
      MetaTables.partitionEntries(spark, dir).map {
        case (tp, unit, files, bytes, buckets) =>
          new GenericInternalRow(Array[Any](tp,
            MetaTables.tpStartMicros(unit, tp),
            MetaTables.utf8(unit), files, bytes, buckets)): InternalRow
      }.toArray
    case k => throw new IllegalArgumentException(s"unknown meta table $k")
  }
}

/** The change data feed as a BATCH table (`graft.ns.t.changes`): raw
  * feed events — the table columns plus `_change_type`
  * (insert / update_preimage / update_postimage / delete) and the
  * `batch` publish id — over the CONTIGUOUS published prefix of the
  * selected range. `batch` comparisons push down to batch-DIRECTORY
  * pruning; `timeLowerBound`/`timeUpperBound` read options additionally
  * skip out-of-range `_tp` dirs of a time-partitioned table's feed
  * (unit-matched batches only, as on the stream). Reading below the
  * retention horizon fails loudly (the missing changes cannot be
  * conjured back) naming the surviving floor; every pushed filter is
  * also re-applied by Spark above the scan, so pruning is purely a
  * data reduction.
  */
private[catalog] final class GraftChangesTable(fullName: String,
    dir: String) extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = fullName

  override def schema(): StructType = {
    val snap = TxLog.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed manifest under $dir"))
    val base = org.apache.spark.sql.types.DataType
      .fromJson(snap.props("schema_json")).asInstanceOf[StructType]
    // the feed's metadata columns are appended by NAME: a base table
    // already carrying either would produce ambiguous fields and the
    // feed reader's projection would shadow the user's data — refuse
    // loudly rather than serve a silently-wrong changes table
    val clash = base.fieldNames.filter(n =>
      n.equalsIgnoreCase("_change_type") || n.equalsIgnoreCase("batch"))
    if (clash.nonEmpty)
      throw new IllegalArgumentException(
        s"$fullName: base table columns ${clash.mkString(", ")} collide " +
          "with the changes table's metadata columns (_change_type, " +
          "batch) — rename them before reading the change feed")
    StructType(base.fields)
      .add("_change_type", StringType, nullable = false)
      .add("batch", LongType, nullable = false)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ChangesScanBuilder(fullName, dir, schema(), options)
}

private[catalog] final class ChangesScanBuilder(fullName: String,
    dir: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var pushedArr: Array[Filter] = Array.empty
  private var allFilters: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Tighten the [lo, hi] batch-id window from `batch` comparisons —
    * top-level conjuncts only (Spark hands conjuncts separately), and
    * every filter is ALSO returned as post-scan, so an unrecognized
    * shape only loses pruning, never rows.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case EqualTo("batch", v) => longOf(v).exists { b =>
        lo = math.max(lo, b); hi = math.min(hi, b); true }
      case GreaterThan("batch", v) => longOf(v).exists { b =>
        lo = math.max(lo, b + 1); true }
      case GreaterThanOrEqual("batch", v) => longOf(v).exists { b =>
        lo = math.max(lo, b); true }
      case LessThan("batch", v) => longOf(v).exists { b =>
        hi = math.min(hi, b - 1); true }
      case LessThanOrEqual("batch", v) => longOf(v).exists { b =>
        hi = math.min(hi, b); true }
      case In("batch", vs) if vs.nonEmpty =>
        val bs = vs.toSeq.flatMap(longOf)
        if (bs.size == vs.length) {
          lo = math.max(lo, bs.min); hi = math.min(hi, bs.max); true
        } else false
      case _ => false
    }
    pushedArr = accepted
    allFilters = filters
    filters // Spark re-applies everything above the scan
  }

  override def pushedFilters(): Array[Filter] = pushedArr

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // `_tp` admission for a TIME-PARTITIONED source: the options range
    // intersected with whatever interval union the pushed filters
    // imply for the partition source column (`WHERE ts >= X` on
    // t.changes skips out-of-range partition dirs INSIDE each batch —
    // same walk as the data scan, Compaction.tpIvsFromFilters).
    // Unit-mismatched batches never prune (checked per batch marker).
    val spark = SparkSession.active
    val fromOptions = graft.streaming.FeedBatchSource.tpPruneOf(dir,
      Option(options.get("timeLowerBound")),
      Option(options.get("timeUpperBound")))
    val tpSpec: Option[(String, String)] =
      TxLog.latest(spark, dir).flatMap(snap =>
        for { u <- snap.prop("tp_unit"); c <- snap.prop("tp_col") }
          yield (u, c))
    val fromFilters: Option[(String, Seq[(Int, Int)])] =
      tpSpec.map { case (u, c) =>
        u -> Compaction.tpIvsFromFilters(allFilters.toSeq, u, c)
      }.filter(_._2 != Compaction.TpAll)
    val tpPrune = (fromOptions, fromFilters) match {
      case (Some((u, a)), Some((_, b))) =>
        Some((u, Compaction.tpIntersect(a, b)))
      case (a, b) => a.orElse(b)
    }
    new GraftChangesScan(fullName, dir, required, lo, hi, tpPrune)
  }
}

private[catalog] final class GraftChangesScan(fullName: String,
    dir: String, required: StructType, lo: Long, hi: Long,
    tpPrune: Option[(String, Seq[(Int, Int)])])
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  private def spark: SparkSession = SparkSession.active

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-changes($fullName, batch in [$lo, $hi])"

  /** Planned-file byte sum — free at estimate time (the partitions
    * are memoized per batch), so a SMALL selected change range joins
    * broadcast instead of inheriting Spark's never-broadcast default
    * for statless v2 scans. Row count stays unknown (feed events per
    * byte vary); sizeInBytes alone drives the broadcast decision.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val bytes =
      try planInputPartitions().collect {
        case p: graft.streaming.FeedFilePartition => p.len
      }.sum
      catch { case scala.util.control.NonFatal(_) =>
        // estimation must never throw where execution would (the
        // retention/gap fences fire loudly at execution)
        Long.MaxValue }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  /** The feed machinery in data-row mode: per-published-file
    * partitions, memoized listings, schema-evolution spellings, `_tp`
    * admission — identical kernel to the changelog stream, planned
    * over a batch-id window instead of offsets.
    */
  private lazy val stream: graft.streaming.FeedBatchStream = {
    val snap = TxLog.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed manifest under $dir"))
    require(snap.props.get("feed").contains("true"),
      s"the table at $dir has no change data feed: create it with " +
        "TBLPROPERTIES ('feed'='true') or enable it with ALTER TABLE " +
        "... SET TBLPROPERTIES ('feed'='true')")
    val events = Compaction.renameEvents(snap.props)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(snap.props("schema_json")).asInstanceOf[StructType]
    val spellings: Map[String, Seq[String]] =
      schema.fieldNames.map(n => n.toLowerCase ->
        Compaction.historicalSpellings(events, n)).toMap
    new graft.streaming.FeedBatchStream(dir, None, -1L,
      rowSchema = Some(required),
      changelogDeleteCol = None,
      spellings = spellings,
      tpPrune = tpPrune)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val snap = TxLog.latest(spark, dir).getOrElse(
      return Array.empty)
    val head = snap.counter("next_feed_batch") - 1L
    val bLo = math.max(0L, lo)
    val bHi = math.min(hi, head)
    if (bHi < bLo) return Array.empty
    // retention fence: a batch below the horizon is GONE — reading
    // past it would silently omit its changes, so refuse with the
    // surviving floor (bound the query with `WHERE batch >= floor`)
    val (hz, minDir) = Compaction.feedFloor(spark, dir)
    val minAvail = if (hz > 0L) hz else minDir.getOrElse(head + 1L)
    if (bLo < minAvail)
      throw new IllegalStateException(
        s"feed batches $bLo..${minAvail - 1} of $dir were removed by " +
          "retention (maintain maxFeedAge / vacuum) — reading the " +
          "range would silently omit their changes; bound the query " +
          s"with WHERE batch >= $minAvail, or re-seed from a table " +
          "snapshot")
    // contiguous published prefix: a committed-but-unpublished batch
    // (writer crashed between commit and publish) caps the read at the
    // gap — repairFeed recovers it — instead of skipping it silently
    val published = Replicator.publishedThrough(spark, dir, bLo - 1, bHi)
    // an EXPLICIT upper bound reaching past the gap must fail loudly:
    // the caller named a range and would otherwise read a silent
    // prefix of it; unbounded reads serve the contiguous prefix (the
    // stream's hold-at-the-gap behavior, batch-shaped)
    if (hi != Long.MaxValue && published < bHi)
      throw new IllegalStateException(
        s"feed batch ${published + 1} of $dir is committed but not " +
          "published (writer crashed between commit and publish?); " +
          s"the requested range reaches batch $bHi — run " +
          "graft.cdc.Compaction.repairFeed to finish the publish, or " +
          s"bound the read at batch <= $published")
    // force the retention/fence state before planning file partitions
    stream.planInputPartitions(
      graft.streaming.FeedBatchOffset(bLo - 1),
      graft.streaming.FeedBatchOffset(published))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    stream.createReaderFactory()
}
