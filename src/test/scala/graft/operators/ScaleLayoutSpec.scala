package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-layout proofs on real plans: salting preserves join results
  * while flattening hot keys, bucketed tables co-locate joins with
  * ZERO shuffle exchanges, and partitionBy layouts prune whole
  * partitions at the source — the levers that keep fact-fact joins and
  * selective scans alive at 100 TB.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  test("partitionBy layout: a partition-key predicate prunes the scan") {
    val dir = tmpDir("prune")
    // events laid out by day — the IVF list_id / date-partition pattern
    spark.range(0, 10000)
      .select($"id", ($"id" % 20).as("day"),
        ($"id" * 7 % 100).as("v"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter($"day" === 3)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the predicate must appear as a PartitionFilters entry on the scan,
    // not a post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") && scan.contains("day"),
      s"partition filter not pushed:\n$scan")

    // and the scan actually reads only the matching partition's files
    val allFiles = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("day="))
    assert(allFiles == 20)
    val readFiles = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(readFiles.contains(1), s"expected 1 partition read, got $readFiles")
    assert(q.count() == 500)
  }

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
