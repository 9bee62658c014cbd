package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on the maintained SCD2 history: a batch that adds
  * a column widens the history (old versions null-extend, untouched
  * buckets included), re-windowing semantics are unchanged, and a
  * narrower later batch null-fills its own rows.
  */
class Scd2EvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("batch with a new column widens history; splicing unchanged") {
    val dir = tmpDir("s2evolve")
    val changelog = spark.range(1, 31).select(col("id"),
      concat(lit("v0-"), col("id")).as("payload"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Scd2.init(changelog, dir, "id", "version", "deleted", nBuckets = 8)

    val batch = Seq((5L, "v1-5", 1L, false, "mobile"))
      .toDF("id", "payload", "version", "deleted", "channel")
    Scd2.merge(spark, dir, batch)

    val hist = Scd2.read(spark, dir)
    assert(hist.columns.contains("channel"))
    val k5 = hist.filter(col("id") === 5L)
      .orderBy(col("version"))
      .select("version", "valid_to", "is_current", "channel")
      .collect().map(r => (r.getLong(0), Option(r.get(1)),
        r.getBoolean(2), Option(r.getString(3))))
    // v0 closed by v1 (old row null channel), v1 current with channel
    assert(k5.toSeq == Seq(
      (0L, Some(1L), false, None),
      (1L, None, true, Some("mobile"))))
    // an untouched key's row survives, null-extended
    val k9 = hist.filter(col("id") === 9L)
      .select("payload", "is_current", "channel").head()
    assert(k9.getString(0) == "v0-9" && k9.getBoolean(1)
      && k9.isNullAt(2))

    // a later narrower batch still merges; its rows read back null
    Scd2.merge(spark, dir,
      Seq((5L, "v2-5", 2L, false)).toDF("id", "payload", "version", "deleted"))
    val k5b = Scd2.read(spark, dir).filter(col("id") === 5L)
      .orderBy(col("version"))
      .select("version", "is_current", "channel")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), Option(r.getString(2))))
    assert(k5b.toSeq == Seq((0L, false, None), (1L, false, Some("mobile")),
      (2L, true, None)))
  }
}
