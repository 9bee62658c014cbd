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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedBatchSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with the caller's original key casing
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft feed source requires .option(\"path\", <table dir>)"))
    new FeedBatchTable(path,
      Option(opts.get("maxBatchesPerTrigger")).map(_.toLong),
      Option(opts.get("startingBatch")).map(_.toLong).getOrElse(-1L))
  }
}

object FeedBatchSource {
  val Schema: StructType = new StructType().add("batch", LongType,
    nullable = false)
}

private[streaming] class FeedBatchTable(tableDir: String,
    maxBatchesPerTrigger: Option[Long],
    startingBatch: Long) extends Table with SupportsRead {

  override def name(): String = s"graft-feed($tableDir)"
  override def schema(): StructType = FeedBatchSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FeedBatchSource.Schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new FeedBatchStream(tableDir, maxBatchesPerTrigger, startingBatch)
      }
    }
}

/** Offset = highest feed batch id made visible to the query (−1 before
  * any). Feed publishes are atomic directory renames with a committed
  * monotonic counter, so the id order IS the publish order.
  */
private[streaming] case class FeedBatchOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

private[streaming] class FeedBatchStream(tableDir: String,
    maxBatchesPerTrigger: Option[Long],
    startingBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def head: Long =
    Replicator.sourceHead(SparkSession.active, tableDir)

  /** Trigger.AvailableNow: fix the drain target at query start so the
    * run terminates even while a writer keeps publishing — WITHOUT
    * this, Spark silently degrades AvailableNow to one unbounded batch
    * and the per-trigger rate limit never applies.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head)

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
    val h = availableNowTarget.map(t => math.min(t, head)).getOrElse(head)
    val capped = maxBatchesPerTrigger match {
      case Some(n) => math.min(h, from + n)
      case None => h
    }
    FeedBatchOffset(math.max(from, capped))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset = FeedBatchOffset(head)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[FeedBatchOffset].batch
    val to = end.asInstanceOf[FeedBatchOffset].batch
    if (to <= from) Array.empty
    else Array(FeedBatchRange(from + 1, to))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FeedBatchReaderFactory

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
