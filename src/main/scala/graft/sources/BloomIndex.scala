package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter data-skipping index: one bloom sidecar row per
  * parquet data file over a chosen long key column, so a point lookup
  * reads only the files whose filter says "maybe".
  *
  * This is the skipping layer footer min/max CANNOT provide: on a
  * hash-scattered layout every file's [min, max] envelope spans the
  * whole key domain and `MetadataScan.fileStats` prunes nothing, while
  * a bloom answers "this exact key is definitely absent" per file —
  * the same per-file bloom sidecars Iceberg/Delta attach through
  * puffin/stats files, here over plain parquet directories. With fpp
  * 0.01 a unique-key lookup touches ~1 + 0.01·files files instead of
  * all of them; at 100 TB that is reading one 128 MB file instead of
  * the dataset.
  *
  * Reference behavior mirrored: the point probes of the export engine
  * (consumer watermark fetch by key, /root/reference/app/services/
  * watermark.py:11-16) — at warehouse scale a keyed probe must skip
  * files, not scan them.
  *
  * Index layout: `indexDir/data` parquet (file, n_keys, bloom bytes),
  * `indexDir/meta` (key_col, fpp, expected items, data schema json) —
  * self-describing, like the LSH/IVF index dirs. Build is ONE
  * distributed pass grouped by `input_file_name()`; maintenance is
  * O(new files) via [[addFiles]]. Lookups deserialize O(files) blooms
  * in a tiny distributed filter over the index itself, never the data.
  *
  * Scale note: the per-file bloom is sized by `expectedItems` (keys
  * per file), NOT dataset size — 1M keys at fpp 0.01 is ~1.2 MB — so
  * index size grows linearly with file count and the candidate filter
  * stays an executor-parallel scan of a table with one row per file.
  */
object BloomIndex {

  /** Aggregator building one bloom per group (= per file). The buffer
    * is the live BloomFilter (Serializable — only crosses the wire
    * once per partition at partial/final merge, not per row).
    */
  private class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, key: Long): BloomFilter = { b.putLong(key); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      a.mergeInPlace(b)
    def finish(b: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization(classOf[BloomFilter])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the index over every data file of `dataPath`: one grouped
    * pass, one bloom row per file. `keyCol` must be integral (cast to
    * long); `expectedItems` sizes each per-file bloom (keys per file,
    * not total).
    */
  def build(spark: SparkSession, dataPath: String, keyCol: String,
      indexDir: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): Unit = {
    import spark.implicits._
    val data = spark.read.parquet(dataPath)
    val agg = udaf(new BloomAgg(expectedItems, fpp))
    data.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_keys"),
        agg(col(keyCol).cast("long")).as("bloom"))
      .write.mode("overwrite").parquet(s"$indexDir/data")
    // driver-side properties file: zero Spark jobs (see MetaFile)
    graft.cdc.MetaFile.write(spark, indexDir, Map(
      "key_col" -> keyCol, "fpp" -> fpp.toString,
      "expected_items" -> expectedItems.toString,
      "schema_json" -> data.schema.json))
  }

  private def meta(spark: SparkSession, indexDir: String)
      : (String, Double, Long, StructType) = {
    val m = graft.cdc.MetaFile.read(spark, indexDir)
    (m("key_col"), m("fpp").toDouble, m("expected_items").toLong,
      DataType.fromJson(m("schema_json")).asInstanceOf[StructType])
  }

  /** Index files not yet covered (new data files since the last build
    * or addFiles): O(new) — only the un-indexed files are read.
    */
  def addFiles(spark: SparkSession, dataPath: String,
      indexDir: String): Long = {
    import spark.implicits._
    val (keyCol, fpp, expectedItems, _) = meta(spark, indexDir)
    val indexed = spark.read.parquet(s"$indexDir/data")
      .select(col("file")).as[String].collect().toSet
    val all = spark.read.parquet(dataPath)
      .select(input_file_name()).distinct().as[String].collect()
    val fresh = all.filterNot(indexed)
    if (fresh.isEmpty) return 0L
    val agg = udaf(new BloomAgg(expectedItems, fpp))
    spark.read.parquet(fresh: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_keys"),
        agg(col(keyCol).cast("long")).as("bloom"))
      .write.mode("append").parquet(s"$indexDir/data")
    fresh.length.toLong
  }

  /** Files that MIGHT contain `key` — the definitely-absent files are
    * gone. A distributed filter over the one-row-per-file index.
    */
  def candidateFiles(spark: SparkSession, indexDir: String,
      key: Long): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/data")
      .select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .filter(r => BloomFilter.readFrom(r._2).mightContainLong(key))
      .map(_._1)
      .collect().toSeq
  }

  /** Exact point lookup through the index: read ONLY the candidate
    * files, then apply the exact predicate (bloom false positives are
    * filtered here — correctness never depends on the filter).
    */
  def lookup(spark: SparkSession, indexDir: String, key: Long): DataFrame = {
    val (keyCol, _, _, schema) = meta(spark, indexDir)
    val cands = candidateFiles(spark, indexDir, key)
    if (cands.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(cands: _*)
        .filter(col(keyCol).cast("long") === key)
  }
}
