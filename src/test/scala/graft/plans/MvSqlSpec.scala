package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction

/** The SQL DDL surface for materialized views (r9 item 4):
  * CREATE / REFRESH / DROP MATERIALIZED VIEW through
  * [[GraftTables.sql]], lowering onto AggView + MvRewrite. The
  * freshness contract holds across the whole lifecycle: a stale view
  * silently serves the BASE (correct, slower), REFRESH re-arms the
  * rewrite, DROP removes both the state and the rewrite.
  */
class MvSqlSpec extends SparkSpec {

  import spark.implicits._

  private val dec18 = (c: org.apache.spark.sql.Column) =>
    c.cast("decimal(18,2)")

  private def dashboard(name: String) = {
    val df = spark.table(name)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec18(col("price"))).cast("double").as("total"))
      .orderBy(col("grp"))
    df.queryExecution.optimizedPlan // force the rewrite decision
    df
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("CREATE / REFRESH / DROP MATERIALIZED VIEW lifecycle") {
    MvRewrite.ensureRegistered(spark)
    val base = tmpDir("mvsql")
    Compaction.init(
      (1L to 60L).map(i => (i, i % 5, i * 1.5, 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      base, Seq("id"), "version", "deleted", nBuckets = 8,
      clusterBy = Nil, feed = true)
    GraftTables.register(spark, "mvsql_base", base)
    val created = GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsql_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsql_base GROUP BY grp""")
    val viewDir = created.select("location").as[String].head()
    assert(viewDir == s"$base/_mv/mvsql_v")

    // one MV per base: a DIFFERENT name refuses (durable, disk-backed
    // check), the SAME name re-creates/replaces
    val e0 = intercept[Exception] {
      GraftTables.sql(spark,
        """CREATE MATERIALIZED VIEW mvsql_v2 AS
          SELECT grp, count(*) AS cnt, sum(price) AS total
          FROM mvsql_base GROUP BY grp""")
    }
    assert(e0.getMessage.contains("one MV per base"), e0.getMessage)
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsql_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsql_base GROUP BY grp""") // replace: no error

    // fresh view serves the UNCHANGED dashboard over the table itself
    val truth0 = asMap(spark.table("mvsql_base")
      .groupBy(col("grp")).agg(count(lit(1)).as("cnt"),
        sum(dec18(col("price"))).cast("double").as("total"))
      .orderBy(col("grp")))
    val q0 = dashboard("mvsql_base")
    assert(Mv.readsView(q0, viewDir), "fresh view should serve")
    assert(asMap(q0) == truth0)

    // the base moves: stale view bails to base — correct either way
    Compaction.merge(spark,
      base,
      Seq((61L, 2L, 100.0, 1L, false), (1L, 1L, 0.0, 1L, true))
        .toDF("id", "grp", "price", "version", "deleted"),
      emitFeed = true)
    GraftTables.refresh(spark, "mvsql_base")
    val q1 = dashboard("mvsql_base")
    assert(!Mv.readsView(q1, viewDir),
      "stale view must bail to the base")
    val truth1 = asMap(q1)

    // SQL REFRESH applies the feed and re-arms the rewrite
    val refreshed = GraftTables.sql(spark,
      "REFRESH MATERIALIZED VIEW mvsql_v")
    assert(refreshed.select("batches_applied").as[Long].head() == 1L)
    val q2 = dashboard("mvsql_base")
    assert(Mv.readsView(q2, viewDir), "REFRESH should re-arm the rewrite")
    assert(asMap(q2) == truth1, "view must equal the base recompute")
    // idempotent: nothing new to apply
    assert(GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW mvsql_v")
      .select("batches_applied").as[Long].head() == 0L)

    // DROP removes state and rewrite
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvsql_v")
    assert(!Mv.readsView(dashboard("mvsql_base"), viewDir))
    assert(!graft.cdc.TxLog.fs(spark, viewDir)
      .exists(new org.apache.hadoop.fs.Path(viewDir)))
  }

  test("unsupported shapes and feed-less bases fail with the contract") {
    val base = tmpDir("mvsql2")
    Compaction.init(
      Seq((1L, 0L, 1.0, 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      base, Seq("id"), "version", "deleted", nBuckets = 4,
      clusterBy = Nil, feed = true)
    GraftTables.register(spark, "mvsql2_base", base)
    val e = intercept[Exception] {
      GraftTables.sql(spark,
        """CREATE MATERIALIZED VIEW bad AS
          SELECT grp, avg(price) AS a FROM mvsql2_base GROUP BY grp""")
    }
    assert(e.getMessage.contains("count(*) AS cnt"), e.getMessage)

    val noFeed = tmpDir("mvsql3")
    Compaction.init(
      Seq((1L, 0L, 1.0, 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      noFeed, "id", "version", "deleted", nBuckets = 4)
    GraftTables.register(spark, "mvsql3_base", noFeed)
    val e2 = intercept[Exception] {
      GraftTables.sql(spark,
        """CREATE MATERIALIZED VIEW bad2 AS
          SELECT grp, count(*) AS cnt, sum(price) AS total
          FROM mvsql3_base GROUP BY grp""")
    }
    assert(e2.getMessage.contains("feed"), e2.getMessage)
  }
}
