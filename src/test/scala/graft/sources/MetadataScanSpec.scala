package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Footer-only aggregates must equal full-scan aggregates — on a
  * multi-file dataset (min-of-mins / max-of-maxs across files), with
  * nulls (null counts summed from chunk stats; min/max ignore
  * all-null chunks), and across the supported physical types
  * (INT64, INT32, DOUBLE, TIMESTAMP).
  */
class MetadataScanSpec extends SparkSpec {

  import spark.implicits._

  test("multi-file footer stats equal full-scan aggregates") {
    val dir = Files.createTempDirectory("meta-scan").resolve("t").toFile.getAbsolutePath
    val df = spark.range(0, 10000)
      .select(col("id"),
        (col("id") % 97).cast("int").as("i"),
        (col("id") * 1.5 - 7000.0).as("d"),
        // every 7th value null: chunk stats must count them and the
        // min/max must still match the scan's null-ignoring semantics
        when(col("id") % 7 =!= 0, col("id") * 2).as("n"),
        timestamp_millis(col("id") * 1000L + 1700000000000L).as("ts"))
    // Spark's default parquet timestamp encoding is INT96, whose footer
    // stats are deprecated/unordered — MetadataScan rejects them. Write
    // INT64 micros (what pyarrow/modern writers emit).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.repartition(5).write.parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")

    val meta = MetadataScan.stats(spark, dir, Seq("id", "i", "d", "n", "ts"))
      .collect()(0)
    val scan = df.agg(
      count(lit(1)), min("id"), max("id"), min("i"), max("i"),
      min("d"), max("d"), min("n"), max("n"),
      sum(when(col("n").isNull, 1L).otherwise(0L)), min("ts"), max("ts"))
      .collect()(0)

    assert(meta.getAs[Long]("n_rows") === scan.getLong(0))
    assert(meta.getAs[Long]("min_id") === scan.getLong(1))
    assert(meta.getAs[Long]("max_id") === scan.getLong(2))
    assert(meta.getAs[Int]("min_i") === scan.getInt(3))
    assert(meta.getAs[Int]("max_i") === scan.getInt(4))
    assert(meta.getAs[Double]("min_d") === scan.getDouble(5))
    assert(meta.getAs[Double]("max_d") === scan.getDouble(6))
    assert(meta.getAs[Long]("min_n") === scan.getLong(7))
    assert(meta.getAs[Long]("max_n") === scan.getLong(8))
    assert(meta.getAs[Long]("nulls_n") === scan.getLong(9))
    assert(meta.getAs[Long]("nulls_id") === 0L)
    assert(meta.getAs[java.sql.Timestamp]("min_ts") === scan.getTimestamp(10))
    assert(meta.getAs[java.sql.Timestamp]("max_ts") === scan.getTimestamp(11))
  }

  test("an entirely-null column yields null min/max and a full null count") {
    val dir = Files.createTempDirectory("meta-scan-null").resolve("t").toFile.getAbsolutePath
    spark.range(0, 100)
      .select(col("id"), lit(null).cast("long").as("v"))
      .coalesce(1).write.parquet(dir)
    val r = MetadataScan.stats(spark, dir, Seq("v")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("min_v")))
    assert(r.isNullAt(r.fieldIndex("max_v")))
    assert(r.getAs[Long]("nulls_v") === 100L)
    assert(r.getAs[Long]("n_rows") === 100L)
  }

  test("filesAbove prunes to exactly the files the watermark touches") {
    val dir = Files.createTempDirectory("meta-prune").resolve("t").toFile
      .getAbsolutePath
    // three ingest batches with disjoint id ranges -> three files, the
    // time-correlated layout incremental export sees in practice
    for ((lo, hi) <- Seq((0, 1000), (1000, 5000), (5000, 10000)))
      spark.range(lo, hi).coalesce(1).write.mode("append").parquet(dir)

    val newest = MetadataScan.filesAbove(spark, dir, "id", 4999L)
    assert(newest.size === 1)
    val lastTwo = MetadataScan.filesAbove(spark, dir, "id", 999L)
    assert(lastTwo.size === 2)
    // none above the global max; everything above below-min watermark
    assert(MetadataScan.filesAbove(spark, dir, "id", 9999L).isEmpty)
    assert(MetadataScan.filesAbove(spark, dir, "id", -1L).size === 3)

    // the pruned read + the same predicate ≡ the full-scan answer
    val pruned = spark.read.parquet(lastTwo: _*).filter(col("id") > 999L)
    val full = spark.read.parquet(dir).filter(col("id") > 999L)
    assert(pruned.count() === full.count())
    assert(pruned.agg(sum("id")).collect()(0).getLong(0)
      === full.agg(sum("id")).collect()(0).getLong(0))
  }

  test("manifest: O(new)-maintained stats answer pruning without footers") {
    val root = Files.createTempDirectory("meta-manifest")
    val dir = root.resolve("t").toFile.getAbsolutePath
    val man = root.resolve("manifest").toFile.getAbsolutePath
    spark.range(0, 1000).coalesce(1).write.mode("append").parquet(dir)
    spark.range(1000, 5000).coalesce(1).write.mode("append").parquet(dir)
    MetadataScan.writeManifest(spark, dir, Seq("id"), man)
    assert(spark.read.parquet(man).count() === 2)

    // a third ingest batch lands; refresh absorbs ONLY the new file
    spark.range(5000, 10000).coalesce(1).write.mode("append").parquet(dir)
    assert(MetadataScan.refreshManifest(spark, dir, man) === 1)
    assert(MetadataScan.refreshManifest(spark, dir, man) === 0)
    assert(spark.read.parquet(man).count() === 3)

    // manifest answers ≡ footer answers, for every watermark position
    for (wm <- Seq(-1L, 999L, 4999L, 9999L))
      assert(
        MetadataScan.filesAboveFromManifest(spark, man, "id", wm).sorted
          === MetadataScan.filesAbove(spark, dir, "id", wm).sorted)
  }

  test("string columns are rejected (truncation-unsafe stats)") {
    val dir = Files.createTempDirectory("meta-scan-str").resolve("t").toFile.getAbsolutePath
    spark.range(0, 10).select(col("id"), col("id").cast("string").as("s"))
      .coalesce(1).write.parquet(dir)
    val e = intercept[Exception] {
      MetadataScan.stats(spark, dir, Seq("s"))
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
