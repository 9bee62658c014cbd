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

    // a base carries SEVERAL rollups (r10 item 5): a second, FINER
    // view registers alongside the first
    val created2 = GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsql_fine AS
        SELECT grp, id, count(*) AS cnt, sum(price) AS total
        FROM mvsql_base GROUP BY grp, id""")
    val fineDir = created2.select("location").as[String].head()
    assert(fineDir == s"$base/_mv/mvsql_fine")

    // CREATE with the identical definition RE-ATTACHES the durable
    // view instead of re-seeding it (post-restart recovery): the view
    // manifest version must not move
    val vBefore = graft.cdc.TxLog.latest(spark, viewDir).get.version
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsql_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsql_base GROUP BY grp""")
    assert(graft.cdc.TxLog.latest(spark, viewDir).get.version == vBefore,
      "identical re-CREATE must re-attach, not re-seed")

    // fresh view serves the UNCHANGED dashboard over the table itself;
    // BOTH rollups match a GROUP BY grp — the CHEAPEST (the 5-row
    // coarse view, not the 60-row fine one) must win
    val truth0 = asMap(spark.table("mvsql_base")
      .groupBy(col("grp")).agg(count(lit(1)).as("cnt"),
        sum(dec18(col("price"))).cast("double").as("total"))
      .orderBy(col("grp")))
    val q0 = dashboard("mvsql_base")
    assert(Mv.readsView(q0, viewDir), "fresh view should serve")
    assert(!Mv.readsView(q0, fineDir),
      "the coarser (cheaper) rollup must win over the finer one")
    assert(asMap(q0) == truth0)
    // a GROUP BY grp, id matches only the fine view
    val qFine = spark.table("mvsql_base")
      .groupBy(col("grp"), col("id"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec18(col("price"))).cast("double").as("total"))
    qFine.queryExecution.optimizedPlan
    assert(Mv.readsView(qFine, fineDir),
      "the finer grouping must be served by the fine rollup")

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

    // REFRESH ALL sweeps every rollup of the base (the fine view is
    // still one batch behind)
    val all = GraftTables.sql(spark,
      "REFRESH ALL MATERIALIZED VIEWS ON mvsql_base")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("mvsql_fine" -> 1L, "mvsql_v" -> 0L), all.toString)

    // DROP removes the dropped view's state and rewrite — the SIBLING
    // stays armed and keeps serving
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvsql_v")
    val q3 = dashboard("mvsql_base")
    assert(!Mv.readsView(q3, viewDir))
    assert(Mv.readsView(q3, fineDir),
      "dropping one view must not disarm its sibling")
    assert(asMap(q3) == truth1)
    assert(!graft.cdc.TxLog.fs(spark, viewDir)
      .exists(new org.apache.hadoop.fs.Path(viewDir)))
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvsql_fine")
  }

  test("avg and count(col) rewrite through the SQL-created view, " +
      "bit-exact across null measures and a refresh (r12)") {
    MvRewrite.ensureRegistered(spark)
    val base = tmpDir("mvsqlavg")
    // every 6th price NULL: nncnt must diverge from cnt
    Compaction.init(
      (1L to 60L).map(i => (i, i % 5,
          if (i % 6 == 0) None else Some(i * 1.5), 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      base, Seq("id"), "version", "deleted", nBuckets = 8,
      clusterBy = Nil, feed = true)
    GraftTables.register(spark, "mvsqlavg_base", base)
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsqlavg_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsqlavg_base GROUP BY grp""")
    val viewDir = s"$base/_mv/mvsqlavg_v"
    def q() = {
      val df = spark.table("mvsqlavg_base")
        .groupBy(col("grp"))
        .agg(avg(dec18(col("price"))).as("avg_price"),
          count(dec18(col("price"))).as("n_nn"),
          count(lit(1)).as("n"))
        .orderBy(col("grp"))
      df.queryExecution.optimizedPlan
      df
    }
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val served = q()
    assert(Mv.readsView(served, viewDir),
      served.queryExecution.optimizedPlan.toString)
    Mv.deregister(base, viewDir)
    val truth = asRows(q()) // base recompute, rewrite disarmed
    GraftTables.sql(spark, // re-attach re-arms the registered rewrite
      """CREATE MATERIALIZED VIEW mvsqlavg_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsqlavg_base GROUP BY grp""")
    assert(asRows(served) == truth,
      "avg/count(col) from partials must be bit-exact vs the base")
    assert(served.collect().exists(r =>
        r.getAs[Long]("n_nn") < r.getAs[Long]("n")),
      "null prices must keep n_nn below n somewhere")
    // a merge flipping null→non-null and non-null→null, then REFRESH:
    // the signed nncnt deltas must land
    Compaction.merge(spark, base,
      Seq((6L, 1L, Some(9.0), 1L, false), // was null → now 9.0
        (7L, 2L, Option.empty[Double], 1L, false)) // was 10.5 → null
        .toDF("id", "grp", "price", "version", "deleted"),
      emitFeed = true)
    GraftTables.refresh(spark, "mvsqlavg_base")
    GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW mvsqlavg_v")
    val after = q()
    assert(Mv.readsView(after, viewDir),
      after.queryExecution.optimizedPlan.toString)
    Mv.deregister(base, viewDir)
    assert(asRows(q()) == asRows(after),
      "post-refresh avg/count(col) must equal the base recompute")
    GraftTables.sql(spark, // re-attach for DROP's registry lookup
      """CREATE MATERIALIZED VIEW mvsqlavg_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsqlavg_base GROUP BY grp""")
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvsqlavg_v")
  }

  test("REFRESH fails loudly when feed retention outran the view") {
    MvRewrite.ensureRegistered(spark)
    val base = tmpDir("mvsqlret")
    Compaction.init(
      (1L to 20L).map(i => (i, i % 4, i * 2.0, 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      base, Seq("id"), "version", "deleted", nBuckets = 4,
      clusterBy = Nil, feed = true)
    GraftTables.register(spark, "mvsqlret_base", base)
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvsqlret_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM mvsqlret_base GROUP BY grp""")
    // two merges publish feed batches the view has not applied …
    (1 to 2).foreach { i =>
      Compaction.merge(spark, base,
        Seq((100L + i, 1L, 9.0, i.toLong, false))
          .toDF("id", "grp", "price", "version", "deleted"))
    }
    // … and retention releases them before the view catches up
    // (publish markers stamp millis; step past the current one so the
    // strict `< cutoff` expiry always sees them as old)
    Thread.sleep(5)
    Compaction.maintain(spark, base,
      maxFeedAge = java.time.Duration.ZERO)
    val e = intercept[Exception] {
      GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW mvsqlret_v")
    }
    assert(e.getMessage.contains("removed by retention"), e.getMessage)
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvsqlret_v")
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

  test("append-only min/max partials: vmin/vmax serve min/max " +
      "queries; the first retraction invalidates loudly and never " +
      "serves a stale extreme (r13)") {
    MvRewrite.ensureRegistered(spark)
    val base = tmpDir("mvsql-mm")
    Compaction.init(
      (1L to 40L).map(i => (i, i % 4, i * 2.0, 0L, false))
        .toDF("id", "grp", "price", "version", "deleted"),
      base, Seq("id"), "version", "deleted", nBuckets = 4,
      clusterBy = Nil, feed = true)
    GraftTables.register(spark, "mvmm_base", base)
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvmm_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total,
          min(price) AS vmin, max(price) AS vmax
        FROM mvmm_base GROUP BY grp""")
    val viewDir = s"$base/_mv/mvmm_v"

    def extremes = {
      val df = spark.table("mvmm_base").groupBy(col("grp"))
        .agg(min(dec18(col("price"))).cast("double").as("mn"),
          max(dec18(col("price"))).cast("double").as("mx"))
      df.queryExecution.optimizedPlan // force the rewrite decision
      df
    }
    // base truth: the id-touching filter makes the rewrite bail
    def truth = spark.table("mvmm_base").filter(col("id") >= 0)
      .groupBy(col("grp"))
      .agg(min(dec18(col("price"))).cast("double").as("mn"),
        max(dec18(col("price"))).cast("double").as("mx"))
    def asMap3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    assert(Mv.readsView(extremes, viewDir),
      "min/max over the append-only view must serve from vmin/vmax")
    assert(asMap3(extremes) == asMap3(truth))

    // insert-only growth: new keys append, REFRESH rolls the new
    // extremes in, the rewrite keeps serving
    Compaction.merge(spark, base,
      (101L to 110L).map(i => (i, i % 4, i * 50.0, 1L, false))
        .toDF("id", "grp", "price", "version", "deleted"))
    GraftTables.refresh(spark, "mvmm_base") // programmatic-merge contract
    GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW mvmm_v")
    assert(Mv.readsView(extremes, viewDir))
    assert(asMap3(extremes) == asMap3(truth))

    // the first RETRACTION (an update emits a preimage) invalidates
    // the view loudly instead of storing a wrong extreme
    Compaction.merge(spark, base,
      Seq((105L, 105L % 4, 1.0, 2L, false))
        .toDF("id", "grp", "price", "version", "deleted"))
    GraftTables.refresh(spark, "mvmm_base")
    val e = intercept[Exception] {
      GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW mvmm_v")
    }
    assert(e.getMessage.contains("invalid") ||
      e.getMessage.contains("retraction"), e.getMessage)
    assert(graft.cdc.TxLog.latest(spark, viewDir).get
      .prop("invalid").isDefined, "the invalidation must be durable")
    // never a stale answer: the query bails to the BASE and reflects
    // the update (key 105's old max is gone)
    assert(!Mv.readsView(extremes, viewDir),
      "an invalidated view must never serve")
    assert(asMap3(extremes) == asMap3(truth))

    // the one-statement remedy (r13): ALTER ... REBUILD re-seeds from
    // the current base, clears the invalid marker and re-arms
    GraftTables.sql(spark, "ALTER MATERIALIZED VIEW mvmm_v REBUILD")
    assert(graft.cdc.TxLog.latest(spark, viewDir).get
      .prop("invalid").isEmpty, "REBUILD must clear the invalidation")
    assert(Mv.readsView(extremes, viewDir))
    assert(asMap3(extremes) == asMap3(truth))

    // re-CREATE with the identical definition now RE-ATTACHES the
    // healthy rebuilt view (and would re-create an invalid one)
    GraftTables.sql(spark,
      """CREATE MATERIALIZED VIEW mvmm_v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total,
          min(price) AS vmin, max(price) AS vmax
        FROM mvmm_base GROUP BY grp""")
    assert(Mv.readsView(extremes, viewDir))
    assert(asMap3(extremes) == asMap3(truth))

    // contract violations fail with the contract: vmin without vmax,
    // or min/max on a different column than the sum
    val e3 = intercept[Exception] {
      GraftTables.sql(spark,
        """CREATE MATERIALIZED VIEW mvmm_bad AS
          SELECT grp, count(*) AS cnt, sum(price) AS total,
            min(price) AS vmin
          FROM mvmm_base GROUP BY grp""")
    }
    assert(e3.getMessage.contains("vmin"), e3.getMessage)
    val e4 = intercept[Exception] {
      GraftTables.sql(spark,
        """CREATE MATERIALIZED VIEW mvmm_bad AS
          SELECT grp, count(*) AS cnt, sum(price) AS total,
            min(id) AS vmin, max(id) AS vmax
          FROM mvmm_base GROUP BY grp""")
    }
    assert(e4.getMessage.contains("vmin"), e4.getMessage)
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW mvmm_v")
  }
}
