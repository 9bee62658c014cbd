package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GlobalRank must reproduce the engine's own global window exactly:
  * the distributed sharded-prefix rank equals row_number over one
  * partition, and ntileOf equals the ntile builtin — including the
  * ragged sizes when n % k != 0.
  */
class GlobalRankSpec extends SparkSpec {

  import spark.implicits._

  test("withRunningTotals: N prefix sums == N single windows, any shards") {
    val df = (1 to 500).map(i =>
      (i.toLong, (i * 7919 % 100).toDouble, (i % 7).toLong, (i % 11).toLong))
      .toDF("id", "v", "a", "b")
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("sa", sum(col("a")).over(w))
      .withColumn("sb", sum(col("b")).over(w))
      .select(col("id"), col("sa"), col("sb")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (bounds <- Seq(Seq.empty[Double], Seq(30.0, 60.0))) {
      val got = GlobalRank.withRunningTotals(df,
          Seq(col("v"), col("id")),
          GlobalRank.rangeShard(col("v"), bounds),
          Seq("sa" -> col("a"), "sb" -> col("b")))
        .select(col("id"), col("sa"), col("sb")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"bounds=$bounds")
    }
  }

  test("sharded rank == single-partition row_number, any shard split") {
    val df = (1 to 997).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
      .toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
    val expected = df.withColumn("rn", row_number().over(w).cast("long"))
      .select(col("id"), col("rn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (bounds <- Seq(Seq.empty[Double], Seq(500.0), Seq(250.0, 500.0, 750.0))) {
      val got = GlobalRank.withGlobalRank(df, Seq(col("v"), col("id")),
          GlobalRank.rangeShard(col("v"), bounds), "rn")
        .select(col("id"), col("rn")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"bounds=$bounds")
    }
  }

  test("sharded running total == single-window cumulative sum") {
    val df = (1 to 500).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
      .toDF("id", "v")
      .withColumn("dec_v", col("v").cast("decimal(18,2)"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("ct", sum(col("dec_v")).over(w))
      .select(col("id"), col("ct").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = GlobalRank.withRunningTotal(df, Seq(col("v"), col("id")),
        GlobalRank.rangeShard(col("v"), Seq(300.0, 600.0)),
        col("dec_v"), "rn", "ct")
      .select(col("id"), col("ct").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
  }

  test("ntileOf == engine ntile, ragged and exact sizes") {
    for (n <- Seq(1, 7, 10, 23, 100, 997); k <- Seq(1, 3, 10)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val w = Window.orderBy(col("id"))
      val engine = df.withColumn("b", ntile(k).over(w).cast("long"))
      val ours = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
        .withColumn("b2", GlobalRank.ntileOf(col("rnk"), col("n_total"), k))
      val joined = engine.join(ours, "id")
        .filter(col("b") =!= col("b2"))
      assert(joined.isEmpty, s"n=$n k=$k mismatches")
    }
  }
}
