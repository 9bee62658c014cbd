package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-layout proofs on real plans: salting preserves join results
  * while flattening hot keys, and bucketed tables co-locate joins with
  * ZERO shuffle exchanges — the two levers that keep fact-fact joins
  * alive at 100 TB.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  test("salted join: identical result to plain join, salt spreads hot key") {
    // hot key: 10k rows of key=1, plus a uniform tail
    val skewed = spark.range(10000).select(lit(1L).as("k"), $"id".as("v"))
      .union(spark.range(1000).select(($"id" % 50 + 2).as("k"), $"id".as("v")))
    val dim = spark.range(52).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum($"v")).head()
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(plain == salted)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val ord = spark2.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    ord.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark2.table("lineitem_b")
      .join(spark2.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))

    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs no shuffle; the only exchange
    // allowed is the one for the final groupBy
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"join still shuffles:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join still shuffles:\n$plan")

    // and it computes the right thing
    val viaBuckets = joined.orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaPlain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaBuckets == viaPlain)
  }
}
