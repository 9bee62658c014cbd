package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{AggView, Compaction}

/** Round-5 freshness coupling: an AggView registered for transparent
  * rewrite must never serve aggregates the base table has already
  * moved past. The base (a Compaction table) publishes feed batches;
  * the view applies them with the SAME batch ids; the rule compares
  * the two fences per query:
  *
  *  base merge (feed published, view lagging) → query reads the BASE;
  *  applyFeed (view catches up)              → rewrite fires again,
  *
  * with the query's VALUES correct in both states, and no
  * re-registration in between. Also pins manifest-resolved view scans
  * (a refresh is visible without re-registering) and the per-session
  * registry scoping.
  */
class MvFreshnessSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
  }

  private def dashboard(baseData: String) =
    spark.read.parquet(baseData)
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"),
        sum($"price".cast("decimal(18,2)")).as("total"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  test("stale view bails to base; applyFeed re-arms the rewrite") {
    val root = tmpDir("mvfresh")
    val tableDir = s"$root/table"
    val viewDir = s"$root/view"
    val snapshot = (1L to 60L).map(i => (i, i % 5, i * 1.5, 0L, false))
      .toDF("id", "grp", "price", "version", "deleted")
    Compaction.init(snapshot, tableDir, "id", "version", "deleted",
      nBuckets = 8)
    AggView.init(snapshot.select($"grp", $"price"), viewDir,
      "grp", "price", nBuckets = 4)
    // the dashboard aggregates the TABLE's live rows; with the new
    // layout those are the manifest's bucket dirs — resolve them the
    // way a user holding a DataFrame of the table would
    def baseDf() = Compaction.read(spark, tableDir)
    // register against the view with the feed fence coupled; the
    // "base path" the dashboard scans is the table's data dir tree.
    // For a single-generation table that is one path per bucket; use
    // a stable single-root base for the scan instead: re-reading via
    // Compaction.read gives a multi-path scan that pathOf() skips, so
    // aggregate a SINGLE-ROOT copy of the base the way warehouse
    // users point dashboards at one parquet root.
    val baseData = s"$root/base-flat"
    baseDf().write.mode("overwrite").parquet(baseData)
    // ground truth BEFORE the rule is injected: straight base scans
    val expected0 = asMap(dashboard(baseData))
    Mv.registerAggView(spark, viewDir, baseData, Some(tableDir))
    try {
      withRule {
        val q0 = dashboard(baseData)
        assert(Mv.readsView(q0, viewDir), "fresh view should serve the query")
        assert(asMap(q0) == expected0)

        // base publishes feed batch 0; the view has NOT applied it
        val changes = Seq((61L, 1L, 100.0, 1L, false))
          .toDF("id", "grp", "price", "version", "deleted")
        Compaction.merge(spark, tableDir, changes, emitFeed = true)
        val q1 = dashboard(baseData)
        assert(!Mv.readsView(q1, viewDir),
          "rewrite must bail to the base while the view lags the feed")

        // view catches up with the SAME batch id the feed published
        AggView.applyFeed(spark, viewDir,
          Compaction.readFeed(spark, tableDir), batchId = 0L)
        val q2 = dashboard(baseData)
        assert(Mv.readsView(q2, viewDir),
          "rewrite should re-arm after applyFeed — no re-registration")
        // and the rewritten values reflect the refresh (manifest
        // resolution picked up the new generation without re-register):
        // they must equal an aggregate of the LIVE table — which the
        // rule leaves alone (multi-path scan, not the registered base)
        val expected2 = asMap(baseDf()
          .groupBy($"grp")
          .agg(count(lit(1)).as("n"),
            sum($"price".cast("decimal(18,2)")).as("total")))
        assert(asMap(q2) == expected2)
      }
    } finally Mv.deregister(baseData)
  }

  test("registry is scoped per session") {
    val root = tmpDir("mvscope")
    val base = s"$root/base"
    val viewPath = s"$root/view"
    (1L to 20L).map(i => (i % 4, i * 2.0)).toDF("grp", "price")
      .write.parquet(base)
    Mv.create(spark, base, viewPath, Seq("grp"),
      Seq(Mv.Measure("price")))
    try {
      assert(MvRewrite.registered(base).isDefined)
      val other = spark.newSession()
      // the sibling session shares the JVM but must not see the
      // registration (ADVICE r4: JVM-global registry leaked rewrites
      // across sessions)
      org.apache.spark.sql.SparkSession.setActiveSession(other)
      try assert(MvRewrite.registered(base).isEmpty,
        "registration leaked into a sibling session")
      finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    } finally Mv.deregister(base)
  }
}
