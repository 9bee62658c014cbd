package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Join-driven runtime bucket pruning: an equi-join on the merge key
  * against a small filtered build side pushes the build keys into the
  * scan at runtime (`SupportsRuntimeV2Filtering`), so only the
  * matched keys' buckets are opened — dynamic partition pruning with
  * the hash bucket as the partition, the shape a 100 TB fact-to-dim
  * point-read join takes.
  */
class RuntimePruningSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-dpp-wh")
    spark.conf.set("spark.sql.catalog.gdpp",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdpp.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def factScan(df: DataFrame): BatchScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
    }.flatten
    find(df.queryExecution.executedPlan)
      .find(_.scan.isInstanceOf[GraftScan])
      .getOrElse(fail("no GraftScan in plan:\n" +
        df.queryExecution.executedPlan))
  }

  test("equi-join against a filtered dim prunes the fact scan's buckets") {
    sqlc("""CREATE TABLE gdpp.fact (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='32')""")
    sqlc("""INSERT INTO gdpp.fact
        SELECT id, CAST(id AS DOUBLE), 0L, false FROM range(20000)""")
    // a small dim TABLE (a folded LocalRelation would hide the
    // selective predicate DPP looks for); the filter keeps 2 keys
    val dimPath = tmpDir("dpp-dim")
    Seq((7L, "x"), (19L, "y"), (23L, "y"), (501L, "z"))
      .toDF("k", "tag").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")

    // Key-grouped (SPJ) reporting and runtime filtering are per-scan
    // exclusive, so opt out of v2 bucketing for this scenario; the
    // non-reuse-only DPP planning mode is exercised here, the STOCK
    // default mode in its own case below.
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
    val q = sqlc("""SELECT /*+ BROADCAST(d) */ sum(f.v) AS s
        FROM gdpp.fact f JOIN dpp_dim d ON f.id = d.k
        WHERE d.tag = 'y'""")
    // correctness first — execute THIS dataframe (its executed plan
    // is what the partition inspection below reads)
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(42.0))
    // the executed fact scan carried a runtime filter and opened only
    // the matched keys' buckets (2 distinct keys -> <= 2 of 32)
    val scan = factScan(q)
    assert(scan.toString.contains("RuntimeFilters") &&
      !scan.toString.contains("RuntimeFilters: []"),
      s"expected a runtime filter on the fact scan: $scan")
    val opened = scan.inputRDD.partitions.length
    assert(opened <= 2, s"runtime pruning should open <=2 buckets, " +
      s"opened $opened partitions")
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "true")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("runtime pruning composes with static pushdown and stays correct") {
    sqlc("""CREATE TABLE gdpp.fact2 (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='16')""")
    sqlc("""INSERT INTO gdpp.fact2
        SELECT id, 1.0D, 0L, false FROM range(5000)""")
    val dim2Path = tmpDir("dpp-dim2")
    spark.range(0, 5000, 100).toDF("k")
      .write.mode("overwrite").parquet(dim2Path)
    spark.read.parquet(dim2Path).createOrReplaceTempView("dpp_dim2")
    val q = sqlc("""SELECT /*+ BROADCAST(d) */ count(*) AS n
        FROM gdpp.fact2 f JOIN dpp_dim2 d ON f.id = d.k
        WHERE f.id < 1000""")
    assert(q.as[Long].head() == 10L)
  }

  test("runtime pruning engages under STOCK Spark defaults (AQE + reuse-only DPP)") {
    sqlc("""CREATE TABLE gdpp.fact3 (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='32')""")
    sqlc("""INSERT INTO gdpp.fact3
        SELECT id, CAST(id AS DOUBLE), 0L, false FROM range(20000)""")
    val dimPath = tmpDir("dpp-dim3")
    Seq((7L, "x"), (19L, "y"), (23L, "y"), (501L, "z"))
      .toDF("k", "tag").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim3")
    // NO conf overrides beyond disabling SPJ reporting (per-scan
    // exclusive with runtime filtering): AQE on,
    // dynamicPartitionPruning.reuseBroadcastOnly on — the defaults a
    // stock cluster runs. The "join the 100 TB table to a filtered
    // dim" plan must bucket-prune HERE, not only under tuned confs.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      == "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val q = sqlc("""SELECT /*+ BROADCAST(d) */ sum(f.v) AS s
          FROM gdpp.fact3 f JOIN dpp_dim3 d ON f.id = d.k
          WHERE d.tag = 'y'""")
      assert(q.collect().map(_.getDouble(0)).toSeq == Seq(42.0))
      val scan = factScan(q)
      assert(scan.runtimeFilters.nonEmpty,
        "the scan should carry a runtime IN filter under defaults")
      val opened = scan.inputRDD.getNumPartitions
      assert(opened <= 2,
        s"2 dim keys should open <= 2 of 32 buckets, opened $opened")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("composite-key tuple join prunes to the tuples' cross-product buckets") {
    sqlc("""CREATE TABLE gdpp.cfact (
        tenant BIGINT, id BIGINT, v DOUBLE, version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='tenant,id', 'buckets'='32')""")
    sqlc("""INSERT INTO gdpp.cfact
        SELECT id % 8, id, CAST(id AS DOUBLE), 0L, false
        FROM range(20000)""")
    val dimPath = tmpDir("dpp-cdim")
    // two (tenant, id) tuples: the join binds the WHOLE key tuple
    Seq((3L, 11L, "y"), (5L, 4013L, "y"))
      .toDF("t", "k", "tag").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dpp_cdim")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val q = sqlc("""SELECT /*+ BROADCAST(d) */ sum(f.v) AS s
          FROM gdpp.cfact f
          JOIN dpp_cdim d ON f.tenant = d.t AND f.id = d.k
          WHERE d.tag = 'y'""")
      assert(q.collect().map(_.getDouble(0)).toSeq == Seq(11.0 + 4013.0))
      val opened = factScan(q).inputRDD.getNumPartitions
      // 2 tuples bind both key columns with 2 values each: the cross
      // product is ≤ 4 tuples → ≤ 4 of 32 buckets open
      assert(opened <= 4,
        s"composite runtime pruning should open ≤ 4 buckets, " +
          s"opened $opened partitions")
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "true")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("composite-key v2 DML stays correct with runtime filters advertised") {
    sqlc("""CREATE TABLE gdpp.cdml (
        tenant BIGINT, id BIGINT, name STRING, version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='tenant,id', 'buckets'='16')""")
    sqlc("""INSERT INTO gdpp.cdml
        SELECT id % 4, id, concat('u', id), 0L, false FROM range(400)""")
    sqlc("DELETE FROM gdpp.cdml WHERE tenant = 1 AND id = 5")
    sqlc("UPDATE gdpp.cdml SET name = 'upd', version = 1 " +
      "WHERE tenant = 2 AND id = 6")
    val got = sqlc("SELECT tenant, id, name FROM gdpp.cdml " +
      "WHERE id IN (5, 6)")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((2L, 6L, "upd")),
      s"composite v2 DELETE+UPDATE must apply exactly, got $got")
    assert(sqlc("SELECT count(*) AS n FROM gdpp.cdml").as[Long].head()
      == 399L)
  }
}
