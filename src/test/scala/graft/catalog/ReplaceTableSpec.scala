package graft.catalog

import graft.SparkSpec
import graft.cdc.{Compaction, TxLog}

/** Atomic REPLACE TABLE / CREATE OR REPLACE ... AS SELECT (r14):
  * the replacement stages as a complete invisible table and commits
  * as ONE OCC manifest commit (op=replace) in the SAME manifest log —
  * history stays readable, feed numbering carries, `feed_epoch` fences
  * consumers, and RESTORE refuses to cross the `lineage_floor`.
  */
class ReplaceTableSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-replace-wh")
    spark.conf.set("spark.sql.catalog.rcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcat.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def stageDirs = {
    val f = TxLog.fs(spark, warehouse)
    f.listStatus(new org.apache.hadoop.fs.Path(warehouse))
      .map(_.getPath.getName).filter(_.contains(".stage-"))
  }

  test("RTAS replaces contents, parameters and schema atomically; " +
      "history and feed numbering carry; epoch fences") {
    sqlc("""CREATE TABLE rcat.rt (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8', 'feed'='true')""")
    sqlc("""INSERT INTO rcat.rt
        SELECT id, concat('u', id), 0L, false FROM range(50)""")
    val dir = s"$warehouse/rt"
    val epochBefore = Compaction.feedEpoch(spark, dir)
    val batchBefore = TxLog.latest(spark, dir).get
      .counter("next_feed_batch")
    assert(batchBefore > 0L, "the insert should have emitted a batch")
    val versionBefore = TxLog.latestVersion(spark, dir).get

    // replace with a DIFFERENT schema, key set and bucket count
    sqlc("""CREATE OR REPLACE TABLE rcat.rt
        TBLPROPERTIES ('keys'='k', 'buckets'='4', 'feed'='true')
        AS SELECT id AS k, id * 2 AS doubled, 0L AS version,
          false AS deleted FROM range(10)""")

    // contents and schema are the replacement's
    assert(sqlc("SELECT * FROM rcat.rt").columns.toSeq ==
      Seq("k", "doubled", "version", "deleted"))
    assert(sqlc("SELECT count(*) AS n FROM rcat.rt")
      .as[Long].head() == 10L)
    assert(sqlc("SELECT doubled FROM rcat.rt WHERE k = 3")
      .as[Long].head() == 6L)
    // new parameters took (keys/buckets from the replacing DDL)
    val (keys, _, _, nBuckets) = Compaction.readMeta(spark, dir)
    assert(keys == "k" && nBuckets == 4)

    // ONE replace commit on the same log; pre-replace state readable
    val snap = TxLog.latest(spark, dir).get
    assert(snap.prop("op").contains("replace"))
    assert(snap.version == versionBefore + 1)
    assert(snap.prop("lineage_floor").contains(snap.version.toString))
    val old = sqlc(
      s"SELECT count(*) AS n FROM rcat.rt VERSION AS OF $versionBefore")
    assert(old.as[Long].head() == 50L,
      "pre-replace versions must stay readable via VERSION AS OF")
    assert(Compaction.history(spark, dir)
      .select("operation").as[String].collect().contains("replace"))

    // feed: numbering stayed monotone (one reserved EMPTY batch),
    // epoch bumped exactly once — the checkpointed-consumer fence
    assert(Compaction.feedEpoch(spark, dir) == epochBefore + 1L)
    val batchAfter = snap.counter("next_feed_batch")
    assert(batchAfter == batchBefore + 1L,
      s"expected one reserved empty batch ($batchBefore -> $batchAfter)")
    val fs = TxLog.fs(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/feed/batch=$batchBefore")),
      "the fence batch must be published")
    assert(stageDirs.isEmpty, stageDirs.mkString(", "))

    // writes continue on the replaced table (new merge on new keys)
    sqlc("INSERT INTO rcat.rt SELECT 3L, 99L, 1L, false")
    assert(sqlc("SELECT doubled FROM rcat.rt WHERE k = 3")
      .as[Long].head() == 99L)
    // lineage floor carried through the later merge
    assert(TxLog.latest(spark, dir).get.prop("lineage_floor")
      .contains(snap.version.toString))
  }

  test("RESTORE refuses to cross a REPLACE boundary; at/above it works") {
    sqlc("""CREATE TABLE rcat.rfence (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO rcat.rfence SELECT id, id, 0L, false FROM range(5)")
    val dir = s"$warehouse/rfence"
    sqlc("""CREATE OR REPLACE TABLE rcat.rfence
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        AS SELECT id, id * 10 AS v, 0L AS version, false AS deleted
        FROM range(5)""")
    val floor = TxLog.latestVersion(spark, dir).get
    sqlc("INSERT INTO rcat.rfence SELECT 1L, 999L, 1L, false")
    // below the floor: refused with the replace named
    val e = intercept[IllegalStateException] {
      Compaction.restore(spark, dir, floor - 1)
    }
    assert(e.getMessage.contains("REPLACE TABLE"), e.getMessage)
    // at the floor (the replace commit itself): fine, undoes the merge
    Compaction.restore(spark, dir, floor)
    assert(sqlc("SELECT v FROM rcat.rfence WHERE id = 1")
      .as[Long].head() == 10L)
    // the floor survives the restore commit
    assert(TxLog.latest(spark, dir).get.prop("lineage_floor")
      .contains(floor.toString))
  }

  test("a mid-write failure aborts: old table intact, no residue") {
    sqlc("""CREATE TABLE rcat.rcrash (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO rcat.rcrash SELECT id, id, 0L, false FROM range(20)")
    val dir = s"$warehouse/rcrash"
    val versionBefore = TxLog.latestVersion(spark, dir).get
    spark.udf.register("replace_boom",
      (i: Long) => if (i > 100) throw new RuntimeException("boom")
        else i)
    val failed = try {
      sqlc("""CREATE OR REPLACE TABLE rcat.rcrash
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        AS SELECT id, replace_boom(id) AS v, 0L AS version,
          false AS deleted FROM range(1000)""")
      false
    } catch { case _: Exception => true }
    assert(failed, "the poisoned RTAS must fail")
    // the OLD table is untouched and fully readable
    assert(TxLog.latestVersion(spark, dir).get == versionBefore)
    assert(sqlc("SELECT count(*) AS n FROM rcat.rcrash")
      .as[Long].head() == 20L)
    assert(stageDirs.isEmpty,
      s"abort must reclaim the staging: ${stageDirs.mkString(", ")}")
  }

  test("plain REPLACE TABLE (no AS SELECT) replaces with an empty table") {
    sqlc("""CREATE TABLE rcat.rempty (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO rcat.rempty SELECT id, id, 0L, false FROM range(9)")
    sqlc("""REPLACE TABLE rcat.rempty (
        id BIGINT, s STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    assert(sqlc("SELECT * FROM rcat.rempty").columns.toSeq ==
      Seq("id", "s", "version", "deleted"))
    assert(sqlc("SELECT count(*) AS n FROM rcat.rempty")
      .as[Long].head() == 0L)
    val snap = TxLog.latest(spark, s"$warehouse/rempty").get
    assert(snap.prop("op").contains("replace"))
  }

  test("REPLACE of a missing table refuses; guards hold") {
    // REPLACE TABLE of a table that does not exist
    val e = intercept[Exception] {
      sqlc("""REPLACE TABLE rcat.rmissing (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id')""")
    }
    assert(e.getMessage.toLowerCase.contains("replace") ||
      e.getMessage.toLowerCase.contains("not"), e.getMessage)
    assert(!spark.catalog.tableExists("rcat.rmissing"))
    // CREATE OR REPLACE of a missing table creates it
    sqlc("""CREATE OR REPLACE TABLE rcat.rnew
        TBLPROPERTIES ('keys'='id', 'buckets'='2')
        AS SELECT id, 0L AS version, false AS deleted FROM range(3)""")
    assert(sqlc("SELECT count(*) AS n FROM rcat.rnew")
      .as[Long].head() == 3L)
    // moving the table with a LOCATION clause refuses
    val loc = tmpDir("graft-replace-elsewhere")
    val e2 = intercept[Exception] {
      sqlc(s"""CREATE OR REPLACE TABLE rcat.rnew
        TBLPROPERTIES ('keys'='id', 'buckets'='2')
        LOCATION '$loc'
        AS SELECT id, 0L AS version, false AS deleted FROM range(3)""")
    }
    assert(e2.getMessage.contains("cannot move"), e2.getMessage)
  }

  test("a replica refuses to sync across a REPLACE and converges " +
      "after re-init") {
    import graft.cdc.Replicator
    sqlc("""CREATE TABLE rcat.repl (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')""")
    sqlc("INSERT INTO rcat.repl SELECT id, id, 0L, false FROM range(10)")
    val src = s"$warehouse/repl"
    val rep = tmpDir("replace-replica") + "/rep"
    Replicator.init(spark, src, rep)
    sqlc("INSERT INTO rcat.repl SELECT 1L, 999L, 1L, false")
    Replicator.sync(spark, src, rep)
    assert(Compaction.read(spark, rep).count() == 10L)

    sqlc("""CREATE OR REPLACE TABLE rcat.repl
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')
        AS SELECT id, id * 7 AS v, 0L AS version, false AS deleted
        FROM range(4)""")
    intercept[IllegalStateException] {
      Replicator.sync(spark, src, rep)
    }
    // re-init re-seeds from the replaced snapshot and re-fences
    Replicator.init(spark, src, rep)
    assert(Compaction.read(spark, rep).count() == 4L)
    sqlc("INSERT INTO rcat.repl SELECT 100L, 0L, 1L, false")
    Replicator.sync(spark, src, rep)
    assert(Compaction.read(spark, rep).count() == 5L)
  }

  test("REFRESH MATERIALIZED VIEW re-seeds across a base REPLACE " +
      "instead of replaying pre-replace events") {
    import graft.plans.GraftTables
    sqlc("""CREATE TABLE rcat.mvb (
        id BIGINT, grp STRING, amount DECIMAL(18,2), version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')""")
    sqlc("""INSERT INTO rcat.mvb VALUES
      (1, 'a', 10.00, 1, false), (2, 'a', 20.00, 1, false),
      (3, 'b', 5.00, 1, false)""")
    val base = s"$warehouse/mvb"
    GraftTables.register(spark, "rep_mv_base", base)
    GraftTables.sql(spark,
      "CREATE MATERIALIZED VIEW rep_mv AS SELECT grp, " +
        "count(*) AS cnt, sum(amount) AS total FROM rep_mv_base " +
        "GROUP BY grp")
    val viewDir = s"$base/_mv/rep_mv"
    def viewCounts: Map[String, Long] =
      graft.cdc.AggView.read(spark, viewDir).select("grp", "cnt")
        .as[(String, Long)].collect().toMap
    assert(viewCounts == Map("a" -> 2L, "b" -> 1L))

    // REPLACE with the same column shape but different contents: the
    // epoch fence must drive REFRESH to RE-SEED from the replaced
    // base, never to apply pre-replace feed state
    sqlc("""CREATE OR REPLACE TABLE rcat.mvb
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')
        AS SELECT id, 'b' AS grp, CAST(id AS DECIMAL(18,2)) AS amount,
          0L AS version, false AS deleted FROM range(5)""")
    GraftTables.refresh(spark, "rep_mv_base")
    GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW rep_mv")
    assert(viewCounts == Map("b" -> 5L),
      s"the view must re-seed to the REPLACED state, got $viewCounts")
    // incremental refresh works again on the new lineage
    sqlc("INSERT INTO rcat.mvb VALUES (100, 'a', 3.00, 1, false)")
    GraftTables.refresh(spark, "rep_mv_base")
    GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW rep_mv")
    assert(viewCounts == Map("a" -> 1L, "b" -> 5L))
    GraftTables.sql(spark, "DROP MATERIALIZED VIEW rep_mv")
    GraftTables.unregister(spark, "rep_mv_base")
  }

  test("REFRESH after a shape-changing REPLACE names the cause " +
      "instead of an unresolved-column error") {
    import graft.plans.GraftTables
    sqlc("""CREATE TABLE rcat.mvshape (
        id BIGINT, grp STRING, amount DECIMAL(18,2), version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')""")
    sqlc("INSERT INTO rcat.mvshape VALUES (1, 'a', 10.00, 1, false)")
    val base = s"$warehouse/mvshape"
    GraftTables.register(spark, "mvshape_reg", base)
    GraftTables.sql(spark,
      "CREATE MATERIALIZED VIEW shape_mv AS SELECT grp, " +
        "count(*) AS cnt, sum(amount) AS total FROM mvshape_reg " +
        "GROUP BY grp")
    // the replace drops the 'amount' column the view aggregates
    sqlc("""CREATE OR REPLACE TABLE rcat.mvshape
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')
        AS SELECT id, 'x' AS grp, 0L AS version, false AS deleted
        FROM range(3)""")
    val e = intercept[Exception] {
      GraftTables.sql(spark, "REFRESH MATERIALIZED VIEW shape_mv")
    }
    assert(e.getMessage.contains("REPLACEd") &&
      e.getMessage.contains("amount"), e.getMessage)
    // REBUILD rides the same re-seed seam and must name the cause too
    val er = intercept[Exception] {
      GraftTables.sql(spark, "ALTER MATERIALIZED VIEW shape_mv REBUILD")
    }
    assert(er.getMessage.contains("REPLACEd") &&
      er.getMessage.contains("amount"), er.getMessage)
    // CREATE-re-attach of the same definition must refuse with the
    // named cause as well — the sidecar still matches, but the base
    // no longer carries the view's value column; silently re-attaching
    // (or failing with the seed SELECT's unresolved-column error)
    // would both mislead
    val ec = intercept[Exception] {
      GraftTables.sql(spark,
        "CREATE MATERIALIZED VIEW shape_mv AS SELECT grp, " +
          "count(*) AS cnt, sum(amount) AS total FROM mvshape_reg " +
          "GROUP BY grp")
    }
    assert(ec.getMessage.contains("REPLACEd") &&
      ec.getMessage.contains("amount"), ec.getMessage)
    GraftTables.unregister(spark, "mvshape_reg")
  }

  test("replace on a table that never emitted feed reserves no batch " +
      "but still bumps the universal epoch fence") {
    sqlc("""CREATE TABLE rcat.rnofeed (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    val dir = s"$warehouse/rnofeed"
    sqlc("""CREATE OR REPLACE TABLE rcat.rnofeed
        TBLPROPERTIES ('keys'='id', 'buckets'='2')
        AS SELECT id, 0L AS version, false AS deleted FROM range(4)""")
    val snap = TxLog.latest(spark, dir).get
    assert(snap.counter("next_feed_batch") == 0L)
    assert(snap.counter("feed_epoch") == 1L,
      "the epoch is the universal lineage fence: it bumps even when " +
        "no feed batch is reserved")
    assert(!TxLog.fs(spark, dir)
      .exists(new org.apache.hadoop.fs.Path(s"$dir/feed")))
  }
}
