package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on the maintained compacted table: a changelog
  * that adds a column widens the table (old rows null-extend,
  * including rows in buckets the merge never touched), a changelog
  * missing a stored column null-fills its own rows, and merge
  * semantics (version wins, tombstones, pruning) are unchanged.
  */
class CompactionEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("adding a column widens the table; untouched buckets null-extend") {
    val dir = tmpDir("cevolve")
    val snapshot = spark.range(1, 41).select(col("id"),
      concat(lit("p"), col("id")).as("payload"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Compaction.init(snapshot, dir, "id", "version", "deleted", nBuckets = 8)

    // batch with a NEW column; touches only key 5's bucket (and 100's)
    val batch = Seq((5L, "p5-v1", 1L, false, "eu-west"),
        (100L, "p100-v1", 1L, false, "us-east"))
      .toDF("id", "payload", "version", "deleted", "region")
    val stats = Compaction.merge(spark, dir, batch)
    assert(stats.touchedBuckets.nonEmpty)

    val out = Compaction.read(spark, dir)
    assert(out.columns.contains("region"))
    val byId = out.select("id", "payload", "region")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(byId(5L) == (("p5-v1", Some("eu-west"))))
    assert(byId(100L) == (("p100-v1", Some("us-east"))))
    // a key in a bucket the merge never touched: null-extended
    assert(byId.size == 41)
    val untouchedId = (1L to 40L).find(i => i != 5L &&
      !byId(i)._2.isDefined && byId(i)._1 == s"p$i")
    assert(untouchedId.isDefined, "expected null-extended old rows")

    // next merge with the ORIGINAL (narrower) schema still applies;
    // its rows read back with a null region
    Compaction.merge(spark, dir,
      Seq((7L, "p7-v2", 2L, false)).toDF("id", "payload", "version", "deleted"))
    val after = Compaction.read(spark, dir)
      .select("id", "payload", "region").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2)))))
      .toMap
    assert(after(7L) == (("p7-v2", None)))
    assert(after(5L) == (("p5-v1", Some("eu-west")))) // evolution survives
  }
}
