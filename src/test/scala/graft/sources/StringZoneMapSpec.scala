package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction

/** String zone maps with Iceberg-style truncated bounds (r9 item 5):
  *
  *  - [[MetadataScan.truncateLower]] / [[MetadataScan.truncateUpper]]
  *    produce bounds that are ALWAYS valid (lower ≤ every value,
  *    upper > every value with the truncated prefix) and bounded in
  *    size — including surrogate-pair and shared-long-prefix
  *    adversaries;
  *  - string file pruning ([[MetadataScan.filesAbove]]) is
  *    exact-conservative: it never drops a qualifying file, even when
  *    truncation makes several files' bounds identical;
  *  - maintained-table manifests record truncated bounds for STRING
  *    version columns, `readChangedSince` prunes on them without ever
  *    missing a row, and the catalog's MIN/MAX manifest pushdown
  *    DECLINES string version columns (truncated bounds are prune
  *    bounds, not answers).
  */
class StringZoneMapSpec extends SparkSpec {

  import spark.implicits._

  test("truncateLower/truncateUpper are valid bounds on adversarial input") {
    import MetadataScan.{truncateLower, truncateUpper}
    def bytesLe(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) <= 0
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    val smile = new String(Character.toChars(0x1F600))
    val cases = Seq(
      "short",                              // under the width: identity
      "exactly-16-chars",                   // at the width: identity
      "a-very-long-shared-prefix-000042",   // plain truncation
      "prefix" + smile * 8 + "tail",        // surrogate pairs
      "abcdefghijklmno" + maxCp + "tail")   // max code point at the cut
    cases.foreach { s =>
      val lo = truncateLower(s)
      val hi = truncateUpper(s)
      assert(bytesLe(lo, s), s"lower bound above value for $s")
      assert(bytesLe(s, hi) && (hi == s || !bytesLe(hi, s)),
        s"upper bound below value for $s")
      assert(lo.codePointCount(0, lo.length) <= 16)
    }
    // identity below the width
    assert(truncateLower("short") == "short" &&
      truncateUpper("short") == "short")
    // the all-ceiling pathological max falls back to the full value
    val ceiling = maxCp * 20
    assert(truncateUpper(ceiling) == ceiling)
  }

  test("string file pruning keeps every qualifying file when truncation " +
      "collapses bounds to a shared prefix") {
    // 60 keys sharing a 24-char prefix: every file's truncated bounds
    // are nearly identical — pruning must degrade to keep-all, never
    // to drop-a-qualifier
    val prefix = "tenant-0000000000000000-"
    val dir = tmpDir("strzm")
    (0 until 60).map(i => (f"$prefix$i%04d", i.toLong))
      .toDF("k", "v")
      .repartitionByRange(6, col("k"))
      .write.mode("overwrite").parquet(s"$dir/data")
    val bound = f"$prefix${30}%04d"
    val kept = MetadataScan.filesAbove(spark, s"$dir/data", "k", bound)
    val exact = spark.read.parquet(kept: _*)
      .filter(col("k") > bound).as[(String, Long)].collect().toSet
    val truth = spark.read.parquet(s"$dir/data")
      .filter(col("k") > bound).as[(String, Long)].collect().toSet
    assert(exact == truth, "truncated bounds dropped a qualifying file")
    // and on DISTINGUISHABLE prefixes pruning actually prunes
    val dir2 = tmpDir("strzm2")
    (0 until 60).map(i => (f"k$i%04d-padding-beyond-the-width", i.toLong))
      .toDF("k", "v")
      .repartitionByRange(6, col("k"))
      .write.mode("overwrite").parquet(s"$dir2/data")
    val kept2 = MetadataScan.filesAbove(spark, s"$dir2/data", "k",
      "k0045")
    val total2 = MetadataScan.fileStats(spark, s"$dir2/data", Seq("k"))
      .count()
    assert(kept2.nonEmpty && kept2.size < total2,
      s"expected pruning: kept ${kept2.size} of $total2")
  }

  test("exact stats refuse string columns (truncated bounds are not " +
      "answers)") {
    val dir = tmpDir("strzm3")
    Seq(("aa", 1L), ("zz", 2L)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/data")
    val e = intercept[IllegalArgumentException] {
      MetadataScan.stats(spark, s"$dir/data", Seq("k"))
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("maintained table with a STRING version column: truncated " +
      "manifest bounds, exact changed-since, declined MIN/MAX pushdown") {
    val ver = (i: Int) => f"2026-01-15T00:00:00.$i%06d+00:00" // 32 chars
    val dir = tmpDir("strzm4")
    Compaction.init(
      (1 to 40).map(i => (i.toLong, s"p$i", ver(i), false))
        .toDF("id", "payload", "version", "deleted"),
      dir, key = "id", versionCol = "version", deleteCol = "deleted",
      nBuckets = 8)
    // a later merge bumps a few keys past the watermark
    Compaction.merge(spark, dir,
      Seq((3L, "p3x", ver(50), false), (7L, "p7x", ver(51), false))
        .toDF("id", "payload", "version", "deleted"))
    // manifest stats are truncated (bounded), never raw 32-char values
    val snap = graft.cdc.TxLog.latest(spark, dir).get
    val recorded = snap.props.collect {
      case (k, v) if k.startsWith("maxv.") || k.startsWith("minv.") => v
    }
    assert(recorded.nonEmpty)
    assert(recorded.forall(v => v.codePointCount(0, v.length) <= 17),
      s"string version stats not truncated: ${recorded.maxBy(_.length)}")
    // changed-since over the truncated bounds is exact
    val got = Compaction.readChangedSince(spark, dir, ver(40))
      .select($"id").as[Long].collect().toSet
    assert(got == Set(3L, 7L), got.toString)
    // MIN/MAX through the catalog must NOT answer from the truncated
    // manifest: the result is the true (untruncated) extreme
    spark.conf.set("spark.sql.catalog.gstr",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstr.warehouse", tmpDir("strzm-wh"))
    spark.sql("DROP TABLE IF EXISTS gstr.t")
    spark.sql(s"""CREATE TABLE gstr.t USING graft LOCATION '$dir'
      TBLPROPERTIES ('keys'='id', 'buckets'='8')""")
    val mx = spark.sql("SELECT max(version) AS mx FROM gstr.t")
      .as[String].head()
    assert(mx == ver(51), mx)
  }
}
