package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomIndex: per-file bloom sidecars must (a) never lose a row —
  * lookup ≡ full-scan filter for present AND absent keys, (b) actually
  * prune — a unique key's candidate set is ~1 file out of many on a
  * hash-scattered layout where min/max envelopes prune nothing, and
  * (c) maintain incrementally — addFiles indexes only new files.
  */
class BloomIndexSpec extends SparkSpec {

  private val nFiles = 16

  private def freshData(prefix: String): (String, String) = {
    import spark.implicits._
    val data = tmpDir(prefix + "-data")
    val index = tmpDir(prefix + "-idx")
    // unique ids 0..9999 round-robin scattered over 16 files: every
    // file's [min,max] id envelope spans ~the whole domain
    (0 until 10000).map(i => (i.toLong, s"payload-$i", i % 7))
      .toDF("id", "payload", "grp")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, "id", index,
      expectedItems = 2048, fpp = 0.01)
    (data, index)
  }

  test("lookup equals full-scan filter; absent key yields empty") {
    val (data, index) = freshData("bloom-eq")
    val full = spark.read.parquet(data)
    for (key <- Seq(0L, 4242L, 9999L)) {
      val got = BloomIndex.lookup(spark, index, key)
        .select("id", "payload", "grp").collect().toSet
      val want = full.filter(col("id") === key)
        .select("id", "payload", "grp").collect().toSet
      assert(got == want, s"key $key")
      assert(got.size == 1)
    }
    assert(BloomIndex.lookup(spark, index, 123456789L).count() == 0L)
  }

  test("a unique key prunes to ~1 file where min/max stats cannot") {
    val (data, index) = freshData("bloom-prune")
    // footer envelopes are useless on this layout: every file spans
    // (almost) the full id domain
    val fs = MetadataScan.fileStats(spark, data, Seq("id"))
      .select(col("min_id"), col("max_id")).collect()
    assert(fs.length == nFiles)
    val kept = fs.count(r =>
      r.getAs[Long]("min_id") <= 4242L && r.getAs[Long]("max_id") >= 4242L)
    assert(kept == nFiles,
      s"layout unexpectedly sorted: only $kept/$nFiles envelopes cover the key")
    // the bloom index prunes to the true file + rare false positives
    val cands = BloomIndex.candidateFiles(spark, index, 4242L)
    assert(cands.nonEmpty && cands.size <= 3,
      s"expected ~1 candidate file, got ${cands.size}")
    // and the true file is among them (no false negatives, ever)
    val truth = spark.read.parquet(data)
      .filter(col("id") === 4242L)
      .select(input_file_name()).head().getString(0)
    assert(cands.contains(truth))
  }

  test("addFiles is O(new): only fresh files get indexed, lookups see them") {
    import spark.implicits._
    val (data, index) = freshData("bloom-add")
    val before = spark.read.parquet(s"$index/data")
      .select("file").as[String].collect().toSet
    // land two new files with a disjoint id range
    (20000 until 21000).map(i => (i.toLong, s"late-$i", i % 7))
      .toDF("id", "payload", "grp")
      .repartition(2)
      .write.mode("append").parquet(data)
    val added = BloomIndex.addFiles(spark, data, index)
    assert(added == 2L)
    val after = spark.read.parquet(s"$index/data")
      .select("file").as[String].collect().toSet
    assert((after -- before).size == 2)
    assert(before.subsetOf(after), "existing rows must be untouched")
    // re-running is a no-op
    assert(BloomIndex.addFiles(spark, data, index) == 0L)
    // a new-range key resolves through the refreshed index
    val row = BloomIndex.lookup(spark, index, 20500L)
      .select("payload").head().getString(0)
    assert(row == "late-20500")
    // and prunes to the new files only (+fp slack)
    val cands = BloomIndex.candidateFiles(spark, index, 20500L)
    assert(cands.size <= 3, s"got ${cands.size} candidates")
  }
}
