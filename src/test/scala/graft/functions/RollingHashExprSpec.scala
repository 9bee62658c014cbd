package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollingHashExprSpec extends SparkSpec {

  import spark.implicits._

  test("native expression matches the declarative formulation exactly") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog by the river",
      "PREFIX added: the quick brown fox jumps over the lazy dog",
      "short", // below window size
      "x", // single char
      "", // empty
      "exactly8", // == k
      "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all windows identical
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text").repartition(2)
    val both = df.select($"id",
      RollingHashExpr.rollingFp($"text").as("native"),
      TextFunctions.rollingHashFromCodes(
        TextFunctions.charCodes($"text")).as("declarative"))
    val diff = both.filter(!($"native" <=> $"declarative")).count()
    assert(diff == 0)
    // and on real corpus text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpusDiff = docs.select(
      RollingHashExpr.rollingFp($"text").as("native"),
      TextFunctions.rollingHashFromCodes(
        TextFunctions.charCodes($"text")).as("declarative"))
      .filter(!($"native" <=> $"declarative")).count()
    assert(corpusDiff == 0)
  }

  test("null input yields null; k/keep parameters respected") {
    val df = Seq((1L, Option("some text for hashing windows here")),
      (2L, None: Option[String])).toDF("id", "text")
    val r = df.select($"id",
      RollingHashExpr.rollingFp($"text", k = 4, keep = 3).as("fp"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(r(2L).isEmpty)
    assert(r(1L).get.length == 3)
    assert(r(1L).get == r(1L).get.sorted)
  }

  test("SQL registration: all native functions callable after GraftExtensions.register") {
    graft.GraftExtensions.register(spark)
    Seq(("a b c d e f g h i j")).toDF("text").createOrReplaceTempView("rfp_t")
    val viaSql = spark.sql(
      "SELECT rolling_fp(text) AS fp, rolling_fp(text, 4, 2) AS fp42 FROM rfp_t")
      .as[(Seq[Long], Seq[Long])].head()
    assert(viaSql._1.nonEmpty)
    assert(viaSql._2.length == 2)
    val sh = spark.sql(
      "SELECT simhash64(array(CAST(5 AS BIGINT), CAST(-7 AS BIGINT)))")
      .head().getLong(0)
    assert(sh != 0L)
    val cos = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))"""
        .stripMargin)
      .head().getDouble(0)
    assert(cos == 1.0)
    val mh = spark.sql(
      "SELECT minhash64(array(CAST(5 AS BIGINT), CAST(7 AS BIGINT)), 8, 42)")
      .head().getSeq[Long](0)
    assert(mh.length == 8)
  }
}
