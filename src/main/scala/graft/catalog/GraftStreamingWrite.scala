package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

import graft.cdc.{Compaction, TxLog}

/** Shared executor-side staging machinery for the catalog's v2 write
  * paths (streaming epochs, row-level replaces): each partition's rows
  * land as ONE parquet file written through Spark's own
  * `OutputWriter`, and the driver-side commit turns the staged files
  * into one engine operation.
  */
private[catalog] object GraftStage {

  /** Driver-side: the serializable pieces a task needs to open a
    * parquet writer ([[OutputWriterFactory]] + the job conf flattened
    * to entries — `Configuration` itself is not serializable).
    */
  def prepare(spark: SparkSession, schema: StructType)
      : (OutputWriterFactory, Map[String, String]) = {
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job,
      Map.empty, schema)
    val it = job.getConfiguration.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    (owf, b.result())
  }

  /** Executor-side: a DataWriter staging one parquet file at `path`
    * (created lazily — an empty partition stages nothing).
    */
  def writer(path: String, partitionId: Int, taskId: Long,
      schema: StructType, owf: OutputWriterFactory,
      confEntries: Map[String, String]): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private def conf(): Configuration = {
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private lazy val out = {
        val attempt = new TaskAttemptID(new TaskID(
          new org.apache.hadoop.mapreduce.JobID("graft-stage", 0),
          TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt)
        owf.newInstance(path, schema,
          new TaskAttemptContextImpl(conf(), attempt))
      }

      override def write(record: InternalRow): Unit = {
        out.write(record); rows += 1
      }

      override def commit(): WriterCommitMessage = {
        if (rows > 0) out.close()
        GraftStagedFile(path, rows)
      }

      override def abort(): Unit =
        if (rows > 0) {
          try out.close() catch {
            case scala.util.control.NonFatal(_) => ()
          }
          val p = new Path(path)
          try p.getFileSystem(conf()).delete(p, false) catch {
            case scala.util.control.NonFatal(_) => ()
          }
        }

      override def close(): Unit = ()
    }
}

/** Per-partition staged parquet file (absolute path + row count). */
private[catalog] final case class GraftStagedFile(path: String,
    rows: Long) extends WriterCommitMessage

/** `df.writeStream.toTable("graft.ns.t")` — the DSv2 streaming sink
  * for maintained merge tables. Each micro-batch stages its rows as
  * parquet under a writer-unique epoch directory (one file per
  * partition, written executor-side through Spark's own parquet
  * `OutputWriter`), then the epoch commit — driver-side, once — runs
  * ONE [[Compaction.merge]] over the staged files and drops the
  * staging. This is the capability twin of
  * [[graft.streaming.StreamingCompaction.mergeStream]] (the
  * foreachBatch API route): same exactly-once story — a replayed
  * epoch (micro-batch replay is at-least-once after a failure)
  * re-merges the same (key, version) changelog, and the merge
  * reconciles latest-state idempotently, so the table converges to
  * the same bytes without a transactional sink. Aborted epochs only
  * ever delete their own staging; the table advances exclusively
  * through the manifest CAS.
  */
private[catalog] final class GraftStreamingWrite(dir: String,
    writeSchema: StructType, queryId: String) extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active

  private def stagingRoot = s"$dir/.streamwrite-$queryId"

  private def epochDir(epochId: Long) = s"$stagingRoot/epoch-$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (owf, confEntries) = GraftStage.prepare(spark, writeSchema)
    new GraftStreamWriterFactory(stagingRoot, writeSchema, owf,
      confEntries)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case m: GraftStagedFile if m.rows > 0 => m.path
    }
    if (staged.nonEmpty) {
      val s = spark
      val snap = TxLog.latest(s, dir).getOrElse(
        throw new IllegalArgumentException(
          s"no committed manifest under $dir"))
      val tableCols = DataType.fromJson(snap.props("schema_json"))
        .asInstanceOf[StructType].fieldNames.toSeq
      // `_order` passes through to the merge: it is the engine's
      // sanctioned publish-order tiebreak (readStream.table emits it
      // as a metadata column), recognized by Compaction.merge and
      // never stored — dropping it here would re-open the
      // same-version multi-batch race the channel exists to close
      val keep = tableCols ++
        writeSchema.fieldNames.find(_.equalsIgnoreCase("_order"))
      val batch = s.read.schema(writeSchema).parquet(staged: _*)
        .select(keep.map(col): _*)
      // catalog tables keep history, exactly like the batch INSERT
      Compaction.merge(s, dir, batch, retainHistory = true)
    }
    TxLog.hygiene {
      TxLog.fs(spark, dir).delete(new Path(epochDir(epochId)), true)
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TxLog.hygiene {
      TxLog.fs(spark, dir).delete(new Path(epochDir(epochId)), true)
    }
}

private[catalog] final class GraftStreamWriterFactory(
    stagingRoot: String, schema: StructType,
    owf: OutputWriterFactory, confEntries: Map[String, String])
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    GraftStage.writer(
      s"$stagingRoot/epoch-$epochId/" +
        f"part-$partitionId%05d-$taskId.parquet",
      partitionId, taskId, schema, owf, confEntries)
}
