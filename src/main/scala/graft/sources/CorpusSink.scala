package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corpus interchange sinks/sources: JSONL (the training-data lingua
  * franca) and layout-controlled parquet. The format work is Spark's
  * native json/parquet datasources — what this module adds is the
  * LAYOUT contract that matters at 100 TB:
  *
  *  - bounded file sizes via `maxRecordsPerFile` (readers and object
  *    stores both hate 100 GB single files and million-file dirs);
  *  - directory partitioning on a low-cardinality column so downstream
  *    scans prune whole subtrees (`lang=en/` never read for a `fr` job);
  *  - intra-file ordering via `sortWithinPartitions` — parquet min/max
  *    page stats become selective, and same-key rows co-locate for
  *    downstream merge-friendly reads. Sorting within partitions is a
  *    local sort, NOT a global shuffle.
  */
object CorpusSink {

  /** Write `df` as JSONL under `path/col=value/part-*.json[.gz]`.
    *
    * Layout shuffle is `repartitionByRange(partitionCol, sortCol)` —
    * NOT `repartition(partitionCol)`, which would collapse the write
    * to one task per distinct partition value and serialize the whole
    * corpus through a handful of writers. Range partitioning keeps
    * every core writing while each task still covers a contiguous
    * (partition, sort) slice, so dynamic-partition writes stay tidy
    * (a task touches few partition dirs) and rows arrive sorted.
    */
  def writeJsonl(df: DataFrame, path: String, partitionCol: Option[String],
      sortCol: String, maxRecordsPerFile: Long,
      compression: String = "none"): Unit = {
    val sorted = partitionCol match {
      case Some(p) => df.repartitionByRange(col(p), col(sortCol))
        .sortWithinPartitions(col(p), col(sortCol))
      case None => df.sortWithinPartitions(col(sortCol))
    }
    val w = sorted.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
    partitionCol.fold(w)(p => w.partitionBy(p)).json(path)
  }

  /** Read JSONL with an explicit schema — never schema-inference, which
    * costs a full extra pass over the corpus and types sampled nulls
    * wrong. Partition-column predicates prune directories.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A quarantined read: `good` rows, `bad` raw lines, and `release()`
    * to drop the shared cache once both sides are consumed.
    */
  final case class QuarantinedRead(good: DataFrame, bad: DataFrame,
      release: () => Unit)

  /** JSONL read that QUARANTINES malformed lines instead of nulling or
    * dropping them. Ingest at scale always meets broken shards;
    * silently dropping them skews the corpus and silently nulling
    * them poisons downstream filters. PERMISSIVE capture keeps the
    * scan single-pass — no second read to find the bad lines. The
    * parsed scan is cached so good/bad don't re-read; call
    * `release()` when done or the cache pins corpus-sized storage for
    * the session.
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
      schema: StructType): QuarantinedRead = {
    val corruptCol = "_corrupt_record"
    val withCorrupt = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      // corrupt-record capture requires materializing beyond the
      // corrupt column alone (Spark refuses corrupt-only queries),
      // so split from one cached projection
      .cache()
    val good = withCorrupt.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = withCorrupt.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedRead(good, bad, () => { withCorrupt.unpersist(); () })
  }

  /** Layout-controlled parquet: directory-partitioned, bounded files,
    * locally sorted rows (min/max stats selective on `sortCol`). Same
    * range-shuffle rationale as [[writeJsonl]]: parallelism survives a
    * low-cardinality partition column.
    */
  def writeParquet(df: DataFrame, path: String, partitionCol: String,
      sortCol: String, maxRecordsPerFile: Long): Unit =
    df.repartitionByRange(col(partitionCol), col(sortCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** ORC twin of `writeParquet` — identical layout contract through
    * Spark's native ORC datasource, for lakehouses standardized on
    * ORC/Hive. Predicate pushdown, column pruning, and directory
    * pruning all hold; the intra-file sort makes ORC's row-group
    * min/max indexes selective exactly as with parquet pages.
    */
  def writeOrc(df: DataFrame, path: String, partitionCol: String,
      sortCol: String, maxRecordsPerFile: Long): Unit =
    df.repartitionByRange(col(partitionCol), col(sortCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .orc(path)

  /** Schema-explicit ORC read (same no-inference rule as JSONL). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
