package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only MIN / MAX / COUNT over a parquet dataset: the answer
  * comes entirely from file FOOTERS — row-group row counts and
  * column-chunk statistics — so the job does O(files) work and reads
  * zero data pages. At 100 TB with ~100k files this is the difference
  * between a footer sweep finishing in seconds and a full scan reading
  * the whole dataset to reproduce numbers the writer already recorded
  * (the same trick table formats like Iceberg/Delta pull from their
  * manifests; plain parquet directories carry the identical facts one
  * level down, in each footer).
  *
  * Distribution model: the file listing is parallelized and each task
  * opens only its own files' footers, so the sweep scales with
  * executors, not data volume; the driver never holds more than the
  * final one-row aggregate. This complements `ZOrder`'s row-group
  * pruning (skip data by predicate) with full-table aggregate
  * answering (skip data entirely).
  *
  * Exactness contract (why the oracle can be `SELECT count(*),
  * min(c), max(c) FROM t`):
  *   - `count(*)` = Σ row-group rowCounts — exact by the format spec.
  *   - numeric / date / timestamp min-max — exact: parquet-mr stores
  *     untruncated statistics for fixed-width primitives.
  *   - STRING (BINARY) min-max is intentionally UNSUPPORTED in the
  *     EXACT path: writers may truncate binary stats (parquet-mr
  *     `parquet.statistics.truncate.length`), which keeps them valid
  *     for pruning bounds but not for exact answers. The PRUNING path
  *     ([[fileStats]] / [[filesAbove]] / manifests) supports strings
  *     with Iceberg-style truncated bounds ([[truncateLower]] /
  *     [[truncateUpper]]): a ≤-min prefix and a >-max incremented
  *     prefix, 16 code points each, so string-keyed file pruning works
  *     without ever recording unbounded values.
  *   - DOUBLE/FLOAT columns containing NaN: the parquet spec tells
  *     writers to drop NaN from stats, so min/max then reflect only
  *     non-NaN values — same as SQL aggregate semantics, but Spark's
  *     `max(double)` propagates NaN; callers with NaN data should not
  *     use the footer path (the testdata tables carry no NaN).
  *
  * Reference behavior mirrored: the export engine's range probe
  * `SELECT min(updated_at), max(updated_at), count(*)` shape
  * (/root/reference/README.md export-status reporting) — answered
  * here without scanning.
  */
object MetadataScan {

  private case class ColSpec(name: String, dataType: DataType, kind: String)

  /** One row: `n_rows` plus `min_<col>` / `max_<col>` / `nulls_<col>`
    * for each requested column, computed from footers only. `path` may
    * be a single parquet file or a directory of them. Any file whose
    * footer lacks statistics for a requested column fails the job —
    * an exact aggregate cannot be answered from incomplete metadata.
    */
  def stats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val specs = typedSpecs(spark, path, cols)
    // exactness contract: string footer stats may be TRUNCATED by the
    // writer (and are re-truncated here for pruning) — valid bounds,
    // never exact aggregates
    require(!specs.exists(_.kind == "str"),
      "string min/max may be truncated in parquet footers — exact " +
        "aggregates unsupported; use fileStats/filesAbove (pruning " +
        "bounds are valid)")
    perFileStats(spark, listParquetFiles(spark.sparkContext.hadoopConfiguration, path), specs, strict = true)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        specs.flatMap(s => Seq(
          min(col(s"min_${s.name}")).as(s"min_${s.name}"),
          max(col(s"max_${s.name}")).as(s"max_${s.name}"),
          sum(col(s"nulls_${s.name}")).as(s"nulls_${s.name}"))): _*)
  }

  /** The planning form: one row PER FILE — `file`, `n_rows`, then
    * `min_/max_/nulls_/stats_<col>` for each requested column
    * (`stats_` false ⇒ some chunk lacked statistics; min/max/nulls are
    * then null and any pruning decision must keep the file). Filter
    * this O(files)-row frame on a column's min/max envelope and the
    * result is footer-level FILE PRUNING — the scan plan, computed
    * without opening any data pages.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val specs = typedSpecs(spark, path, cols)
    perFileStats(spark, listParquetFiles(spark.sparkContext.hadoopConfiguration, path), specs, strict = false)
  }

  /** The incremental-export planner (reference semantics: strict `>`
    * watermark, /root/reference/app/main.py incremental path): the
    * files that CAN contain a row with `c` strictly above `bound` —
    * `max_c > bound`, keeping stats-less files conservatively. At
    * 100 TB this turns "scan everything since forever" into "open the
    * footers, read only the files the watermark actually touches";
    * with time-correlated ingest that is the newest few files.
    * The returned list is driver-sized (it's a file list, not data):
    * feed it back to `spark.read.parquet(files: _*)`.
    */
  def filesAbove(spark: SparkSession, path: String, c: String,
      bound: Any): Seq[String] = {
    fileStats(spark, path, Seq(c))
      .filter(!col(s"stats_$c") || col(s"max_$c") > lit(bound))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Persisted manifest: `fileStats` written down, so planning stops
    * re-opening footers. At 100k files a footer sweep is 100k file
    * opens PER QUERY; the manifest is one small parquet read — the
    * same economics that make Delta/Iceberg keep stats in their logs.
    * Self-describing (the tracked columns are recoverable from the
    * manifest's own schema), maintained O(new) by [[refreshManifest]].
    */
  def writeManifest(spark: SparkSession, dataPath: String,
      cols: Seq[String], manifestPath: String): Unit =
    fileStats(spark, dataPath, cols)
      .coalesce(1).write.mode("overwrite").parquet(manifestPath)

  /** Columns a manifest tracks, recovered from its schema. */
  private def manifestCols(m: DataFrame): Seq[String] =
    m.schema.fieldNames.filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSeq

  /** Absorb files that appeared since the manifest was written: opens
    * ONLY the unseen files' footers and appends their rows — per-batch
    * cost is O(new files), never O(dataset). (Immutable-file
    * assumption, same as every manifest design: a REWRITTEN file keeps
    * its path and is not re-read; compaction should rebuild.)
    * Returns how many new files were absorbed.
    */
  def refreshManifest(spark: SparkSession, dataPath: String,
      manifestPath: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val known = spark.read.parquet(manifestPath)
    val cols = manifestCols(known)
    val seen = known.select(col("file")).collect().map(_.getString(0)).toSet
    val fresh = listParquetFiles(conf, dataPath).filterNot(seen)
    if (fresh.nonEmpty) {
      val specs = typedSpecs(spark, dataPath, cols)
      perFileStats(spark, fresh, specs, strict = false)
        .write.mode("append").parquet(manifestPath)
    }
    fresh.size
  }

  /** [[filesAbove]] answered from the manifest instead of footers —
    * zero file opens on the data itself.
    */
  def filesAboveFromManifest(spark: SparkSession, manifestPath: String,
      c: String, bound: Any): Seq[String] =
    spark.read.parquet(manifestPath)
      .filter(!col(s"stats_$c") || col(s"max_$c") > lit(bound))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq

  private def typedSpecs(spark: SparkSession, path: String,
      cols: Seq[String]): Seq[ColSpec] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = listParquetFiles(conf, path)
    require(files.nonEmpty, s"no parquet files under $path")
    // one driver-side footer read to type the requested columns; the
    // schema is format metadata, identical across the dataset's files
    val in = HadoopInputFile.fromPath(new Path(files.head), new Configuration(conf))
    val r = ParquetFileReader.open(in)
    try {
      val msg = r.getFooter.getFileMetaData.getSchema
      cols.map { c =>
        require(msg.containsField(c), s"column $c not in parquet schema")
        val pt = msg.getType(Seq(c): _*).asPrimitiveType()
        ColSpec(c, sparkType(pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation), kindOf(pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation))
      }
    } finally r.close()
  }

  private def perFileStats(spark: SparkSession, files: Seq[String],
      specs: Seq[ColSpec], strict: Boolean): DataFrame = {
    val perFileSchema = StructType(
      StructField("file", StringType, nullable = false) +:
      StructField("n_rows", LongType, nullable = false) +:
      specs.flatMap(s => Seq(
        StructField(s"min_${s.name}", s.dataType),
        StructField(s"max_${s.name}", s.dataType),
        StructField(s"nulls_${s.name}", LongType),
        StructField(s"stats_${s.name}", BooleanType, nullable = false))))
    val specsB = specs.map(s => (s.name, s.kind))
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files, slices).mapPartitions { it =>
      val c = new Configuration()
      it.map(f => fileRow(c, f, specsB, strict))
    }
    spark.createDataFrame(rows, perFileSchema)
  }

  private def listParquetFiles(conf: Configuration, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p.toString)
    else {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            n.endsWith(".parquet"))
          buf += f.getPath.toString
      }
      buf.result()
    }
  }

  private def sparkType(p: PrimitiveTypeName, l: LogicalTypeAnnotation): DataType =
    (p, l) match {
      case (PrimitiveTypeName.INT64, t: TimestampLogicalTypeAnnotation) =>
        TimestampType
      case (PrimitiveTypeName.INT64, _) => LongType
      case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) => DateType
      case (PrimitiveTypeName.INT32, _) => IntegerType
      case (PrimitiveTypeName.DOUBLE, _) => DoubleType
      case (PrimitiveTypeName.FLOAT, _) => FloatType
      // strings carry TRUNCATED bounds (Iceberg-style, see truncate*
      // below): valid for pruning (fileStats / filesAbove), refused by
      // the exact-aggregate path (stats)
      case (PrimitiveTypeName.BINARY,
          _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        StringType
      case other => throw new IllegalArgumentException(
        s"footer stats unsupported for $other (binary stats may be truncated)")
    }

  private def kindOf(p: PrimitiveTypeName, l: LogicalTypeAnnotation): String =
    (p, l) match {
      case (PrimitiveTypeName.INT64, t: TimestampLogicalTypeAnnotation) =>
        t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => "ts_ms"
          case LogicalTypeAnnotation.TimeUnit.MICROS => "ts_us"
          case u => throw new IllegalArgumentException(s"timestamp unit $u")
        }
      case (PrimitiveTypeName.INT64, _) => "i64"
      case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) => "date"
      case (PrimitiveTypeName.INT32, _) => "i32"
      case (PrimitiveTypeName.DOUBLE, _) => "f64"
      case (PrimitiveTypeName.FLOAT, _) => "f32"
      case (PrimitiveTypeName.BINARY,
          _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) => "str"
      case other => throw new IllegalArgumentException(s"$other")
    }

  /** Iceberg-style string bound truncation (UnicodeUtil semantics),
    * keeping recorded bounds SMALL without ever making them wrong:
    * the lower bound is a code-point prefix (a prefix sorts ≤ the
    * original in UTF-8 byte order, which matches code-point order),
    * the upper bound is the prefix with its last incrementable code
    * point bumped (strictly > anything extending the prefix). A max
    * whose prefix cannot be incremented (every code point at the
    * ceiling) keeps its full value — valid, merely long, and only
    * pathological data hits it.
    */
  private[graft] def truncateLower(s: String, len: Int = 16): String =
    if (s.codePointCount(0, s.length) <= len) s
    else s.substring(0, s.offsetByCodePoints(0, len))

  private[graft] def truncateUpper(s: String, len: Int = 16): String = {
    if (s.codePointCount(0, s.length) <= len) return s
    val cut = s.substring(0, s.offsetByCodePoints(0, len))
    var i = cut.codePointCount(0, cut.length) - 1
    while (i >= 0) {
      val off = cut.offsetByCodePoints(0, i)
      val cp = cut.codePointAt(off)
      if (cp < Character.MAX_CODE_POINT) {
        // skip the surrogate range: lone surrogates are not valid
        // scalar values and would not round-trip through UTF-8
        val next =
          if (cp + 1 >= Character.MIN_SURROGATE.toInt &&
              cp + 1 <= Character.MAX_SURROGATE.toInt)
            Character.MAX_SURROGATE.toInt + 1
          else cp + 1
        return cut.substring(0, off) + new String(Character.toChars(next))
      }
      i -= 1
    }
    s
  }

  /** Fold one file's footer into (file, n_rows, then
    * min/max/nulls/stats-ok per col). All-null chunks contribute SQL
    * nulls to min/max, which aggregation ignores — matching aggregate
    * semantics. A chunk with no statistics fails in `strict` mode
    * (exact answers need complete metadata) and marks the column's
    * `stats_` flag false otherwise (pruning must keep the file).
    */
  private def fileRow(conf: Configuration, file: String,
      specs: Seq[(String, String)], strict: Boolean): Row = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = r.getFooter.getBlocks
      var nRows = 0L
      val mins = Array.fill[Any](specs.size)(null)
      val maxs = Array.fill[Any](specs.size)(null)
      val nulls = Array.fill[Long](specs.size)(0L)
      val ok = Array.fill[Boolean](specs.size)(true)
      blocks.forEach { b =>
        nRows += b.getRowCount
        b.getColumns.forEach { cc =>
          val dotted = cc.getPath.toDotString
          val i = specs.indexWhere(_._1 == dotted)
          if (i >= 0) {
            val st = cc.getStatistics
            if (st == null || !st.isNumNullsSet) {
              require(!strict,
                s"$file: $dotted has no footer statistics — cannot answer " +
                  "from metadata (fall back to a data scan)")
              ok(i) = false
            } else {
              nulls(i) += st.getNumNulls
              if (st.hasNonNullValue) {
                val kind = specs(i)._2
                val lo = convert(st.genericGetMin.asInstanceOf[AnyRef], kind)
                val hi = convert(st.genericGetMax.asInstanceOf[AnyRef], kind)
                if (mins(i) == null || cmp(lo, mins(i)) < 0) mins(i) = lo
                if (maxs(i) == null || cmp(hi, maxs(i)) > 0) maxs(i) = hi
              }
            }
          }
        }
      }
      Row.fromSeq(file +: (nRows: Any) +: specs.indices.flatMap(i =>
        if (ok(i)) {
          // string bounds re-truncate once per file (the per-chunk
          // fold above compared full footer values)
          val (lo, hi) =
            if (specs(i)._2 == "str" && mins(i) != null)
              (truncateLower(mins(i).asInstanceOf[String]),
                truncateUpper(maxs(i).asInstanceOf[String]))
            else (mins(i), maxs(i))
          Seq[Any](lo, hi, nulls(i), true)
        } else Seq[Any](null, null, null, false)))
    } finally r.close()
  }

  private def convert(v: AnyRef, kind: String): Any = kind match {
    case "i64" | "i32" | "f64" | "f32" => v
    case "ts_ms" => new java.sql.Timestamp(v.asInstanceOf[java.lang.Long])
    case "ts_us" =>
      val us = v.asInstanceOf[java.lang.Long]
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    case "date" => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].toLong))
    case "str" =>
      new String(v.asInstanceOf[org.apache.parquet.io.api.Binary]
        .getBytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  @SuppressWarnings(Array("unchecked"))
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    // UTF-8 byte order, matching both parquet's binary stat order and
    // Spark's UTF8String comparison — java.lang.String.compareTo is
    // UTF-16 code-unit order and diverges above the BMP
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }
}
