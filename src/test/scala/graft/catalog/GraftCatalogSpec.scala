package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction
import graft.plans.GraftTables

/** The DSv2 `TableCatalog`: CREATE/SHOW/DROP through plain SQL,
  * INSERT INTO = upsert merge via the standard v2 write path (no
  * extension rule involved), SELECT through the engine's own pruned
  * read, VERSION AS OF / TIMESTAMP AS OF time travel, MERGE/UPDATE/
  * DELETE lowering on catalog identifiers, and external-LOCATION
  * attach of a pre-existing maintained table.
  */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-cat-wh")
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  test("CREATE TABLE + INSERT INTO + SELECT round-trips with upsert semantics") {
    sqlc("""CREATE TABLE gcat.users (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8')""")
    // empty after create, under the declared schema
    assert(sqlc("SELECT * FROM gcat.users").columns.toSeq ==
      Seq("id", "name", "version", "deleted"))
    assert(sqlc("SELECT * FROM gcat.users").count() == 0)

    sqlc("""INSERT INTO gcat.users
        SELECT id, concat('u', id), 0L, false FROM range(100)""")
    assert(sqlc("SELECT count(*) AS n FROM gcat.users")
      .as[Long].head() == 100L)

    // re-inserting an existing key at a higher version upserts
    // (ON CONFLICT DO UPDATE), and a tombstone row deletes
    sqlc("INSERT INTO gcat.users SELECT 7L, 'seven2', 1L, false")
    sqlc("INSERT INTO gcat.users SELECT 9L, '', 1L, true")
    val got = sqlc("SELECT id, name FROM gcat.users")
      .as[(Long, String)].collect().toMap
    assert(got.size == 99 && got(7L) == "seven2" && !got.contains(9L))

    // point lookup through SQL answers correctly (bucket pruning
    // engages in the inner plan when MergePruning is registered)
    assert(sqlc("SELECT name FROM gcat.users WHERE id = 7")
      .as[String].head() == "seven2")
  }

  test("SHOW TABLES, tableExists, DROP TABLE") {
    sqlc("""CREATE TABLE gcat.droppable (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id')""")
    val names = sqlc("SHOW TABLES IN gcat")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("droppable"))
    assert(spark.catalog.tableExists("gcat.droppable"))
    sqlc("DROP TABLE gcat.droppable")
    assert(!spark.catalog.tableExists("gcat.droppable"))
    val after = sqlc("SHOW TABLES IN gcat")
      .select("tableName").as[String].collect().toSet
    assert(!after.contains("droppable"))
  }

  test("namespaces: CREATE NAMESPACE + nested table") {
    sqlc("CREATE NAMESPACE IF NOT EXISTS gcat.nsx")
    sqlc("""CREATE TABLE gcat.nsx.t (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.nsx.t SELECT id, 0L, false FROM range(5)")
    assert(sqlc("SELECT count(*) AS n FROM gcat.nsx.t")
      .as[Long].head() == 5L)
    val names = sqlc("SHOW TABLES IN gcat.nsx")
      .select("tableName").as[String].collect().toSet
    assert(names == Set("t"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel through SQL") {
    sqlc("""CREATE TABLE gcat.tt (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.tt SELECT id, 'a', 0L, false FROM range(10)")
    Thread.sleep(1100) // manifest mtime granularity for TIMESTAMP AS OF
    val betweenMs = System.currentTimeMillis()
    sqlc("INSERT INTO gcat.tt SELECT 3L, 'b', 1L, false")

    assert(sqlc("SELECT v FROM gcat.tt WHERE id = 3")
      .as[String].head() == "b")
    // v1 = after the first insert (v0 is the empty CREATE commit)
    assert(sqlc("SELECT v FROM gcat.tt VERSION AS OF 1 WHERE id = 3")
      .as[String].head() == "a")
    assert(sqlc("SELECT count(*) AS n FROM gcat.tt VERSION AS OF 0")
      .as[Long].head() == 0L)
    // a timestamp between the two inserts resolves to the first
    val ts = new java.sql.Timestamp(betweenMs)
    assert(spark.sql(
      s"SELECT v FROM gcat.tt TIMESTAMP AS OF '$ts' WHERE id = 3")
      .as[String].head() == "a")
    // writes against a pinned table are refused
    val e = intercept[Exception] {
      GraftTables.sql(spark,
        "UPDATE gcat.tt VERSION AS OF 1 SET v = 'x'")
    }
    assert(e != null)
  }

  test("MERGE INTO / UPDATE / DELETE on catalog identifiers") {
    sqlc("""CREATE TABLE gcat.dml (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("""INSERT INTO gcat.dml
        SELECT id, concat('u', id), 0L, false FROM range(20)""")
    Seq((3L, "three2", 1L, false), (100L, "new", 1L, false))
      .toDF("id", "name", "version", "deleted")
      .createOrReplaceTempView("gcat_src")

    GraftTables.sql(spark,
      """MERGE INTO gcat.dml USING gcat_src ON gcat.dml.id = gcat_src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    GraftTables.sql(spark,
      "UPDATE gcat.dml SET name = concat(name, '!') WHERE id < 2")
    GraftTables.sql(spark, "DELETE FROM gcat.dml WHERE id = 5")

    val got = sqlc("SELECT id, name FROM gcat.dml")
      .as[(Long, String)].collect().toMap
    assert(got.size == 20) // 20 - 1 delete + 1 insert
    assert(got(3L) == "three2" && got(100L) == "new")
    assert(got(0L) == "u0!" && got(1L) == "u1!" && got(2L) == "u2")
    assert(!got.contains(5L))
    // catalog DML retained history: the pre-merge version still reads
    assert(sqlc("SELECT name FROM gcat.dml VERSION AS OF 1 WHERE id = 3")
      .as[String].head() == "u3")
  }

  test("INSERT OVERWRITE replaces the table contents") {
    sqlc("""CREATE TABLE gcat.ovr (
        id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.ovr SELECT id, 0L, 0L, false FROM range(50)")
    sqlc("INSERT OVERWRITE gcat.ovr SELECT id, 1L, 0L, false FROM range(3)")
    val got = sqlc("SELECT id, v FROM gcat.ovr")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("external LOCATION attaches an existing maintained table") {
    val ext = tmpDir("gcat-ext") + "/t"
    Compaction.init(
      (1L to 30L).map(i => (i, s"x$i", 0L, false))
        .toDF("id", "payload", "version", "deleted"),
      ext, "id", "version", "deleted", nBuckets = 4)
    sqlc(s"""CREATE TABLE gcat.ext (
        id BIGINT, payload STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id') LOCATION '$ext'""")
    assert(sqlc("SELECT count(*) AS n FROM gcat.ext")
      .as[Long].head() == 30L)
    // DML through the catalog identifier writes the external dir
    GraftTables.sql(spark, "DELETE FROM gcat.ext WHERE id <= 10")
    assert(Compaction.countRows(spark, ext) == 20L)
    // DROP unregisters but keeps external data
    sqlc("DROP TABLE gcat.ext")
    assert(!spark.catalog.tableExists("gcat.ext"))
    assert(Compaction.countRows(spark, ext) == 20L)
  }

  test("dataframe writeTo append routes through the merge") {
    sqlc("""CREATE TABLE gcat.wt (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.range(10).select(col("id"), lit(0L).as("version"),
        lit(false).as("deleted"))
      .writeTo("gcat.wt").append()
    spark.range(5).select(col("id"), lit(1L).as("version"),
        lit(false).as("deleted"))
      .writeTo("gcat.wt").append()
    // 10 keys, 5 upserted at v1 — still 10 rows
    assert(sqlc("SELECT count(*) AS n FROM gcat.wt")
      .as[Long].head() == 10L)
  }

  test("VACUUM / OPTIMIZE maintenance SQL over catalog and registry names") {
    sqlc("""CREATE TABLE gcat.mnt (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.mnt SELECT id, 'a', 0L, false FROM range(20)")
    sqlc("INSERT INTO gcat.mnt SELECT 1L, 'b', 1L, false")
    sqlc("INSERT INTO gcat.mnt SELECT 2L, 'c', 1L, false")
    // catalog writes retain history: several manifests on disk
    val dir = tmpDirOf("gcat.mnt")
    assert(graft.cdc.TxLog.versionsOnDisk(spark, dir).size == 4)
    val res = GraftTables.sql(spark, "VACUUM gcat.mnt RETAIN 0 HOURS")
      .as[(String, Int)].head()
    assert(res._2 == 3, s"vacuumed ${res._2}")
    assert(graft.cdc.TxLog.versionsOnDisk(spark, dir).size == 1)
    assert(sqlc("SELECT count(*) AS n FROM gcat.mnt").as[Long].head() == 20)

    // OPTIMIZE folds a merge-on-read chain (registry name route)
    val rdir = tmpDir("gcat-opt") + "/t"
    Compaction.init(
      (1L to 10L).map(i => (i, s"v$i", 0L, false))
        .toDF("id", "v", "version", "deleted"),
      rdir, "id", "version", "deleted", nBuckets = 4)
    Compaction.merge(spark,  rdir,
      Seq((1L, "m", 1L, false)).toDF("id", "v", "version", "deleted"),
      mergeOnRead = true)
    GraftTables.register(spark, "opt_tbl", rdir)
    assert(Compaction.deltaStats(spark, rdir).nonEmpty)
    val folded = GraftTables.sql(spark, "OPTIMIZE opt_tbl")
      .as[(String, Int)].head()
    assert(folded._2 == 1, s"folded ${folded._2}")
    assert(Compaction.deltaStats(spark, rdir).isEmpty)

    // a target that is NOT ours delegates to spark.sql untouched
    // (another extension may own VACUUM); plain Spark then rejects
    // the statement it does not know
    val e = intercept[Exception] {
      GraftTables.sql(spark, "VACUUM nope.nothere")
    }
    assert(!e.getMessage.contains("maintained table"), e.getMessage)
  }

  test("DESCRIBE HISTORY: commit audit log with operations and lineage") {
    sqlc("""CREATE TABLE gcat.hist (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.hist SELECT id, 'a', 0L, false FROM range(10)")
    val dir = tmpDirOf("gcat.hist")
    Compaction.merge(spark, dir,
      Seq((1L, "m", 1L, false)).toDF("id", "v", "version", "deleted"),
      retainHistory = true, mergeOnRead = true)
    Compaction.compact(spark, dir, 1, retainHistory = true)

    val h = GraftTables.sql(spark, "DESCRIBE HISTORY gcat.hist")
      .select($"version", $"operation", $"live_rows", $"dirty_buckets")
      .as[(Long, String, Long, Int)].collect().toList
    assert(h.map(_._1) == List(3L, 2L, 1L, 0L), h.toString) // desc
    assert(h.map(_._2) == List("compact", "merge-mor", "merge", "create"),
      h.toString)
    assert(h.find(_._1 == 2L).get._4 == 1, "MoR commit shows its dirty bucket")
    assert(h.head._4 == 0)
    // lineage chains (txn ids present and linked)
    val lin = GraftTables.sql(spark, "DESCRIBE HISTORY gcat.hist")
      .select($"version", $"txn_id", $"base_txn")
      .as[(Long, String, Option[String])].collect()
      .sortBy(_._1)
    lin.sliding(2).foreach { case Array(pv, cv) =>
      assert(cv._3.contains(pv._2), s"lineage break at v${cv._1}")
    }
  }

  test("changeStream subscribes to a catalog table's data rows by name") {
    sqlc("""CREATE TABLE gcat.cs (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    // catalog INSERT does not emit a feed; use the engine API with
    // emitFeed for the published change batch
    val dir = tmpDirOf("gcat.cs")
    Compaction.merge(spark, dir,
      Seq((1L, "x", 0L, false)).toDF("id", "v", "version", "deleted"),
      emitFeed = true)
    val sink = tmpDir("gcat-cs-sink")
    val q = GraftTables.changeStream(spark, "gcat.cs")
      .writeStream.format("parquet")
      .option("path", s"$sink/out")
      .option("checkpointLocation", s"$sink/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    val rows = spark.read.parquet(s"$sink/out")
      .select($"id", $"_change_type", $"batch")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "insert", 0L)), s"got $rows")
  }

  private def tmpDirOf(name: String): String = {
    val parts = name.split('.')
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog]
    cat.tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
      parts.tail.init, parts.last))
  }

  test("qualified DML never hits a same-named registry table") {
    // registry table "shadow" and catalog table gcat.shadow coexist;
    // DML on the QUALIFIED name must mutate the catalog table only
    val rdir = tmpDir("gcat-shadow-reg") + "/t"
    Compaction.init(
      (1L to 5L).map(i => (i, s"reg$i", 0L, false))
        .toDF("id", "v", "version", "deleted"),
      rdir, "id", "version", "deleted", nBuckets = 4)
    GraftTables.register(spark, "shadow", rdir)
    sqlc("""CREATE TABLE gcat.shadow (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.shadow SELECT id, concat('cat', id), 0L, false FROM range(1, 6)")

    GraftTables.sql(spark, "DELETE FROM gcat.shadow WHERE id = 1")
    // catalog table lost the row; the registered table is untouched
    assert(sqlc("SELECT count(*) AS n FROM gcat.shadow")
      .as[Long].head() == 4L)
    assert(Compaction.countRows(spark, rdir) == 5L)
    // and the bare name still routes to the registry
    GraftTables.sql(spark, "DELETE FROM shadow WHERE id = 2")
    assert(Compaction.countRows(spark, rdir) == 4L)
    assert(sqlc("SELECT count(*) AS n FROM gcat.shadow")
      .as[Long].head() == 4L)
  }

  test("failed external CREATE leaves no phantom table") {
    val ext = tmpDir("gcat-phantom") + "/t"
    Compaction.init(
      Seq((1L, "a", 0L, false)).toDF("id", "v", "version", "deleted"),
      ext, "id", "version", "deleted", nBuckets = 4)
    // declared keys mismatch the existing table's -> CREATE fails ...
    val e = intercept[Exception] {
      sqlc(s"""CREATE TABLE gcat.phantom (
          id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
          TBLPROPERTIES ('keys'='v') LOCATION '$ext'""")
    }
    assert(e.getMessage.contains("keys"), e.getMessage)
    // ... and must leave nothing registered behind
    assert(!spark.catalog.tableExists("gcat.phantom"))
    val names = sqlc("SHOW TABLES IN gcat")
      .select("tableName").as[String].collect().toSet
    assert(!names.contains("phantom"))
  }

  test("DESCRIBE HISTORY counts merge-on-read delta rows") {
    sqlc("""CREATE TABLE gcat.hmor (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    val dir = tmpDirOf("gcat.hmor")
    Compaction.merge(spark, dir,
      (1L to 7L).map(i => (i, s"m$i", 1L, false))
        .toDF("id", "v", "version", "deleted"),
      retainHistory = true, mergeOnRead = true)
    val h = GraftTables.sql(spark, "DESCRIBE HISTORY gcat.hmor")
      .select($"version", $"live_rows").as[(Long, Long)].collect().toMap
    assert(h(1L) == 7L, s"MoR commit under-reported rows: $h")
  }

  test("catalog refuses to attach an Scd2/AggView dir as a merge table") {
    import graft.cdc.Scd2
    val hist = tmpDir("gcat-scd2") + "/h"
    Scd2.init(
      Seq((1L, "a", 0L, false)).toDF("id", "v", "version", "deleted"),
      hist, "id", "version", "deleted", nBuckets = 4)
    val e = intercept[Exception] {
      sqlc(s"""CREATE TABLE gcat.wrongtype (
          id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
          TBLPROPERTIES ('keys'='id') LOCATION '$hist'""")
    }
    assert(e.getMessage.contains("scd2"), e.getMessage)
    assert(!spark.catalog.tableExists("gcat.wrongtype"))
  }

  test("concurrent catalog INSERTs: OCC serializes, no lost write") {
    sqlc("""CREATE TABLE gcat.conc (
        id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gcat.conc SELECT id, 'base', 0L, false FROM range(50)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            // each writer inserts its own disjoint key range
            spark.sql(s"""INSERT INTO gcat.conc
              SELECT id + ${1000 * w}, 'w$w', 1L, false FROM range(20)""")
            ()
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    // all four writers' rows landed (OCC retried the losers)
    val got = sqlc("SELECT v, count(*) AS n FROM gcat.conc GROUP BY v")
      .as[(String, Long)].collect().toMap
    assert(got("base") == 50L)
    (1 to 4).foreach(w => assert(got(s"w$w") == 20L, s"writer $w: $got"))
  }

  test("CREATE without keys property fails with a clear message") {
    val e = intercept[Exception] {
      sqlc("CREATE TABLE gcat.nokeys (id BIGINT, version BIGINT, deleted BOOLEAN)")
    }
    assert(e.getMessage.contains("keys"), e.getMessage)
  }

  test("CREATE TABLE ... USING scd2: SQL-created history, populated " +
      "by Scd2.merge, read-only through the catalog") {
    sqlc("""CREATE TABLE gcat.s2hist (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        USING scd2 TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    // empty history reads under the GENERATED schema (state columns
    // plus the engine's interval pair)
    val cols = sqlc("SELECT * FROM gcat.s2hist").columns.toSeq
    assert(cols.contains("valid_to") && cols.contains("is_current"),
      cols.toString)
    assert(sqlc("SELECT * FROM gcat.s2hist").count() == 0L)
    // populate through the history API (the catalog serves scd2
    // read-only); two versions of one key become two intervals
    val dir = s"$warehouse/s2hist"
    graft.cdc.Scd2.merge(spark,
      dir,
      Seq((1L, "a", 0L, false), (1L, "b", 1L, false),
        (2L, "x", 0L, false))
        .toDF("id", "name", "version", "deleted"))
    val got = sqlc("""SELECT id, name, valid_to, is_current
        FROM gcat.s2hist ORDER BY id, version""")
      .as[(Long, String, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq((1L, "a", Some(1L), false),
      (1L, "b", None, true), (2L, "x", None, true)), got.toString)
    // writes through the catalog refuse (scd2 is read-only there)
    val e = intercept[Exception] {
      sqlc("INSERT INTO gcat.s2hist VALUES (3, 'z', 0, false, NULL, true)")
    }
    assert(e.getMessage.contains("read-only") ||
      e.getMessage.contains("merge") ||
      e.getMessage.toLowerCase.contains("does not support"), e.getMessage)
    // a plain (merge) CREATE cannot clobber the scd2 dir via LOCATION
    val e2 = intercept[Exception] {
      sqlc(s"""CREATE TABLE gcat.s2clash (
          id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
          TBLPROPERTIES ('keys'='id') LOCATION '$dir'""")
    }
    assert(e2.getMessage.contains("scd2"), e2.getMessage)
    // while USING scd2 LOCATION attaches to it
    sqlc(s"""CREATE TABLE gcat.s2attach (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        USING scd2 TBLPROPERTIES ('keys'='id') LOCATION '$dir'""")
    assert(sqlc("SELECT count(*) AS n FROM gcat.s2attach")
      .as[Long].head() == 3L)
  }

  test("atomic CTAS: success publishes once, a mid-write failure " +
      "leaves NO table, a name race refuses at commit (r13)") {
    // success: one staged write, published by one rename
    sqlc("""CREATE TABLE gcat.ctas_ok
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        AS SELECT id, concat('v', id) AS name, 0L AS version,
          false AS deleted FROM range(80)""")
    assert(sqlc("SELECT count(*) AS n FROM gcat.ctas_ok")
      .as[Long].head() == 80L)
    // no staging residue under the warehouse
    val f = graft.cdc.TxLog.fs(spark, warehouse)
    def stageDirs = f.listStatus(new org.apache.hadoop.fs.Path(warehouse))
      .map(_.getPath.getName).filter(_.contains(".stage-"))
    assert(stageDirs.isEmpty, stageDirs.mkString(", "))

    // mid-write failure: the write aborts, the staging dir is gone,
    // and NO table exists — not even an empty one (the pre-staging
    // CTAS stranded exactly that)
    spark.udf.register("ctas_boom",
      (i: Long) => if (i > 50) throw new RuntimeException("boom") else i)
    intercept[Exception] {
      sqlc("""CREATE TABLE gcat.ctas_fail
          TBLPROPERTIES ('keys'='id', 'buckets'='4')
          AS SELECT id, ctas_boom(id) AS v, 0L AS version,
            false AS deleted FROM range(100)""")
    }
    assert(!spark.catalog.tableExists("gcat.ctas_fail"),
      "a failed CTAS must leave no table")
    assert(sqlc("SHOW TABLES IN gcat").collect()
      .forall(_.getString(1) != "ctas_fail"))
    assert(stageDirs.isEmpty,
      s"abort must reclaim the staging dir: ${stageDirs.mkString(", ")}")

    // name race: two stagings of one identifier commit in turn — the
    // loser refuses at publish, the winner's table is untouched
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "ctas_race")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, version BIGINT, deleted BOOLEAN")
    val props = new java.util.HashMap[String, String]()
    props.put("keys", "id")
    props.put("buckets", "2")
    val a = cat.stageCreate(ident, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    val b = cat.stageCreate(ident, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    // an in-flight staging is never a listable table
    assert(sqlc("SHOW TABLES IN gcat").collect()
      .forall(!_.getString(1).contains(".stage-")),
      "staging dirs must stay invisible to SHOW TABLES")
    a.commitStagedChanges()
    intercept[org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException] {
      b.commitStagedChanges()
    }
    assert(sqlc("SELECT count(*) AS n FROM gcat.ctas_race")
      .as[Long].head() == 0L, "the winner's (empty) table must survive")
    assert(stageDirs.isEmpty,
      "the losing staging must be reclaimed on refusal")

    // a crash-orphaned staging (never committed, never aborted) is
    // reclaimed by the NEXT stageCreate of the same identifier once
    // past the sweep grace — the same liveness rule TxLog's sweep
    // grants in-flight writers
    val orphanIdent = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "ctas_orphan")
    cat.stageCreate(orphanIdent, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props) // abandoned: no commit, no abort
    assert(stageDirs.nonEmpty, "the abandoned staging should linger")
    val prevGrace = graft.cdc.TxLog.orphanGraceMs
    graft.cdc.TxLog.orphanGraceMs = 0L
    try {
      val c = cat.stageCreate(orphanIdent, schema,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        props)
      assert(stageDirs.size == 1,
        s"the aged orphan must be reclaimed: ${stageDirs.mkString(", ")}")
      c.abortStagedChanges()
    } finally graft.cdc.TxLog.orphanGraceMs = prevGrace
    assert(stageDirs.isEmpty)
    sqlc("DROP TABLE gcat.ctas_ok")
    sqlc("DROP TABLE gcat.ctas_race")
  }

  test("a crashed external-LOCATION CTAS publish completes through " +
      "the staged intent: no stranded data, no manual attach (r14)") {
    val ext = tmpDir("gcat-ext-pub")
    val loc = s"$ext/pub_t"
    // crash between the publish rename and the warehouse redirect —
    // the r13 window that stranded committed data at the LOCATION
    GraftCatalog.afterPublishRename =
      () => throw new RuntimeException("simulated crash before redirect")
    val failed =
      try {
        sqlc(s"""CREATE TABLE gcat.pub_t
          TBLPROPERTIES ('keys'='id', 'buckets'='4')
          LOCATION '$loc'
          AS SELECT id, 0L AS version, false AS deleted FROM range(25)""")
        false
      } catch { case _: Exception => true }
      finally GraftCatalog.afterPublishRename = () => ()
    assert(failed, "the armed failpoint must fail the CTAS")
    // the rename landed: data is committed at the LOCATION...
    assert(graft.cdc.TxLog.latestVersion(spark, loc).isDefined,
      "the publish rename should have committed the table at LOCATION")
    // ...and the FIRST resolution of the name completes the redirect
    // (loadTable's miss path) — the committed table is served, the
    // recovery is automatic
    assert(sqlc("SELECT count(*) AS n FROM gcat.pub_t")
      .as[Long].head() == 25L,
      "the crashed publish must complete on first resolution")
    assert(spark.catalog.tableExists("gcat.pub_t"))
    // intent and rename-riding marker are consumed
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/pub_t/.location-intent")), "intent must be consumed")
    assert(!graft.cdc.TxLog.fs(spark, loc).listStatus(
        new org.apache.hadoop.fs.Path(loc))
      .exists(_.getPath.getName.startsWith(".publish-")),
      "the publish marker must be consumed")
    // a retry-style CTAS of the same name refuses: the table exists,
    // with the first attempt's committed contents intact
    intercept[Exception] {
      sqlc(s"""CREATE TABLE gcat.pub_t
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        LOCATION '$loc'
        AS SELECT id, 0L AS version, false AS deleted FROM range(7)""")
    }
    assert(sqlc("SELECT count(*) AS n FROM gcat.pub_t")
      .as[Long].head() == 25L)
    sqlc("DROP TABLE gcat.pub_t") // external: unregisters only
  }

  test("a crash BEFORE the publish rename leaves a dead intent that " +
      "ages out; the name stays creatable (r14)") {
    val ext = tmpDir("gcat-ext-pub2")
    val loc = s"$ext/pub2_t"
    // simulate: intent written, rename never happened (writer died) —
    // write the intent by hand against a staging that no longer exists
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    val md = new org.apache.hadoop.fs.Path(s"$warehouse/pub2_t")
    wf.mkdirs(md)
    val out = wf.create(
      new org.apache.hadoop.fs.Path(md, ".location-intent"), true)
    out.write(s"$loc\ndeadbeef".getBytes("UTF-8")); out.close()
    // within the grace the intent is left alone (a live writer may be
    // mid-publish) and the name resolves to nothing
    assert(!spark.catalog.tableExists("gcat.pub2_t"))
    // past the grace a new CTAS of the name retires the intent and
    // proceeds
    val prevGrace = graft.cdc.TxLog.orphanGraceMs
    graft.cdc.TxLog.orphanGraceMs = 0L
    try {
      sqlc(s"""CREATE TABLE gcat.pub2_t
        TBLPROPERTIES ('keys'='id', 'buckets'='2')
        LOCATION '$loc'
        AS SELECT id, 0L AS version, false AS deleted FROM range(9)""")
    } finally graft.cdc.TxLog.orphanGraceMs = prevGrace
    assert(sqlc("SELECT count(*) AS n FROM gcat.pub2_t")
      .as[Long].head() == 9L)
    assert(!wf.exists(
      new org.apache.hadoop.fs.Path(md, ".location-intent")))
    sqlc("DROP TABLE gcat.pub2_t")
  }

  test("plain CREATE TABLE after a crashed external-CTAS publish " +
      "completes the publish and refuses with exists (r15)") {
    val ext = tmpDir("gcat-ext-pub3")
    val loc = s"$ext/pub3_t"
    GraftCatalog.afterPublishRename =
      () => throw new RuntimeException("simulated crash before redirect")
    try intercept[Exception] {
      sqlc(s"""CREATE TABLE gcat.pub3_t
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        LOCATION '$loc'
        AS SELECT id, 0L AS version, false AS deleted FROM range(25)""")
    } finally GraftCatalog.afterPublishRename = () => ()
    assert(graft.cdc.TxLog.latestVersion(spark, loc).isDefined)
    // the data at LOCATION is committed — a plain CREATE of the name
    // must complete the crashed publish FIRST (createTable runs the
    // same intent retirement as stageCreate) and then fail with
    // exists, instead of succeeding over a live intent that a later
    // staging would "complete" by repointing the new table's data dir
    intercept[Exception] {
      sqlc("""CREATE TABLE gcat.pub3_t (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    }
    assert(sqlc("SELECT count(*) AS n FROM gcat.pub3_t")
      .as[Long].head() == 25L,
      "the crashed CTAS semantically succeeded; CREATE resolves it")
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/pub3_t/.location-intent")))
    sqlc("DROP TABLE gcat.pub3_t")
  }

  test("a stale publish intent never repoints a live table: staging " +
      "retires it instead of completing (r15)") {
    // a committed external maintained table to play the crashed CTAS's
    // LOCATION payload
    val ext = tmpDir("gcat-ext-stale")
    val loc = s"$ext/stale_payload"
    sqlc(s"""CREATE TABLE gcat.stale_src
      TBLPROPERTIES ('keys'='id', 'buckets'='2')
      LOCATION '$loc'
      AS SELECT id, 0L AS version, false AS deleted FROM range(11)""")
    sqlc("DROP TABLE gcat.stale_src") // external: unregisters only
    // a LIVE managed table of the poisoned name
    sqlc("""CREATE TABLE gcat.stale_live (
      id BIGINT, v BIGINT, version BIGINT, deleted BOOLEAN)
      TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    sqlc("INSERT INTO gcat.stale_live SELECT id, id*2, 0L, false FROM range(5)")
    // fabricate the crashed-publish residue AGAINST the live name:
    // intent on the warehouse side, rename-riding marker at loc
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    val md = new org.apache.hadoop.fs.Path(s"$warehouse/stale_live")
    val out = wf.create(
      new org.apache.hadoop.fs.Path(md, ".location-intent"), true)
    out.write(s"$loc\ncafebabe".getBytes("UTF-8")); out.close()
    val lf = graft.cdc.TxLog.fs(spark, loc)
    lf.create(new org.apache.hadoop.fs.Path(loc, ".publish-cafebabe"),
      true).close()
    // the next staging of the name must RETIRE the intent (the live
    // table won), not complete it — completing would write a redirect
    // over stale_live and the REPLACE below would rewrite the payload
    // table at loc instead of the live managed table
    sqlc("""CREATE OR REPLACE TABLE gcat.stale_live
      TBLPROPERTIES ('keys'='id', 'buckets'='2')
      AS SELECT id, 0L AS version, false AS deleted FROM range(3)""")
    assert(!wf.exists(new org.apache.hadoop.fs.Path(md, ".location")),
      "no redirect may appear on the live managed table")
    assert(!wf.exists(
      new org.apache.hadoop.fs.Path(md, ".location-intent")),
      "the stale intent must be retired")
    assert(!lf.exists(
      new org.apache.hadoop.fs.Path(loc, ".publish-cafebabe")),
      "the stale marker must be retired with it")
    assert(sqlc("SELECT count(*) AS n FROM gcat.stale_live")
      .as[Long].head() == 3L, "REPLACE rewrote the managed table")
    assert(Compaction.read(spark, loc).count() == 11L,
      "the unadopted payload at LOCATION stays untouched")
    sqlc("DROP TABLE gcat.stale_live")
  }

  test("MOVE TABLE (ALTER ... SET LOCATION) relocates the whole " +
      "directory with history and feed intact (r15)") {
    sqlc("""CREATE TABLE gcat.move_t (
      id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
      TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    sqlc("""INSERT INTO gcat.move_t
      SELECT id, concat('a', id), 0L, false FROM range(50)""")
    sqlc("INSERT INTO gcat.move_t SELECT 7L, 'moved7', 1L, false")
    val newLoc = tmpDir("gcat-move-dst") + "/t"
    sqlc(s"ALTER TABLE gcat.move_t SET LOCATION '$newLoc'")
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    // serving from the new location through the redirect
    val rp = new org.apache.hadoop.fs.Path(
      s"$warehouse/move_t/.location")
    assert(wf.exists(rp), "the redirect must be written")
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_t")
      .as[Long].head() == 50L)
    assert(sqlc("SELECT v FROM gcat.move_t WHERE id = 7")
      .as[String].head() == "moved7")
    // history moved: time travel still reaches the pre-upsert value
    assert(sqlc(
      "SELECT v FROM gcat.move_t VERSION AS OF 1 WHERE id = 7")
      .as[String].head() == "a7", "manifest history must move")
    // feed moved: the change batches read from the new dir
    assert(graft.cdc.Compaction.readFeed(spark, newLoc).count() > 0,
      "feed batches must move")
    // intent and marker retired; old managed data freed
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_t/.move-intent")))
    val oldChildren = wf.listStatus(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_t")).map(_.getPath.getName).toSet
    assert(oldChildren == Set(".location"),
      s"old managed dir must hold only the redirect, got $oldChildren")
    // DML keeps working at the new home
    sqlc("INSERT INTO gcat.move_t SELECT 99L, 'post-move', 2L, false")
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_t")
      .as[Long].head() == 51L)
    sqlc("DROP TABLE gcat.move_t") // external now: unregisters
  }

  test("a crash mid-MOVE leaves the source serving; the retry " +
      "completes; a post-swap crash retry is idempotent (r15)") {
    sqlc("""CREATE TABLE gcat.move_c (
      id BIGINT, v STRING, version BIGINT, deleted BOOLEAN)
      TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    sqlc("""INSERT INTO gcat.move_c
      SELECT id, concat('x', id), 0L, false FROM range(20)""")
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    val newLoc = tmpDir("gcat-move-crash") + "/t"
    // crash between the target publish rename and the redirect swap
    GraftCatalog.afterMoveRename =
      () => throw new RuntimeException("crash before swap")
    try intercept[Exception] {
      sqlc(s"ALTER TABLE gcat.move_c SET LOCATION '$newLoc'")
    } finally GraftCatalog.afterMoveRename = () => ()
    // source untouched and serving; the copy sits complete at the
    // target with its marker, the intent is durable
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.location")),
      "no redirect may exist after a pre-swap crash")
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_c")
      .as[Long].head() == 20L, "the source must keep serving")
    assert(wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.move-intent")))
    // retry completes (resumes at the swap — the fence version still
    // matches, so the completed copy is reused)
    sqlc(s"ALTER TABLE gcat.move_c SET LOCATION '$newLoc'")
    assert(wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.location")))
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_c")
      .as[Long].head() == 20L)
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.move-intent")))
    // now a post-swap crash on a SECOND move: the table serves the
    // new home already; re-running the same MOVE just retires remnants
    val thirdLoc = tmpDir("gcat-move-crash2") + "/t"
    GraftCatalog.afterMoveSwap =
      () => throw new RuntimeException("crash after swap")
    try intercept[Exception] {
      sqlc(s"ALTER TABLE gcat.move_c SET LOCATION '$thirdLoc'")
    } finally GraftCatalog.afterMoveSwap = () => ()
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_c")
      .as[Long].head() == 20L, "post-swap: the new home serves")
    assert(wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.move-intent")), "remnant intent lingers")
    sqlc(s"ALTER TABLE gcat.move_c SET LOCATION '$thirdLoc'")
    assert(!wf.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/move_c/.move-intent")),
      "idempotent retry retires the remnants")
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_c")
      .as[Long].head() == 20L)
    sqlc("DROP TABLE gcat.move_c")
  }

  test("MOVE refuses to clobber a committed table at the target (r15)") {
    sqlc("""CREATE TABLE gcat.move_r (
      id BIGINT, version BIGINT, deleted BOOLEAN)
      TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    sqlc("INSERT INTO gcat.move_r SELECT id, 0L, false FROM range(5)")
    val occupied = tmpDir("gcat-move-occupied") + "/t"
    sqlc(s"""CREATE TABLE gcat.move_other
      TBLPROPERTIES ('keys'='id', 'buckets'='2')
      LOCATION '$occupied'
      AS SELECT id, 0L AS version, false AS deleted FROM range(9)""")
    val e = intercept[Exception] {
      sqlc(s"ALTER TABLE gcat.move_r SET LOCATION '$occupied'")
    }
    assert(e.getMessage.contains("committed table"), e.getMessage)
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_other")
      .as[Long].head() == 9L, "the occupant is untouched")
    assert(sqlc("SELECT count(*) AS n FROM gcat.move_r")
      .as[Long].head() == 5L)
    sqlc("DROP TABLE gcat.move_r")
    sqlc("DROP TABLE gcat.move_other")
  }

  test("an unreadable (partially written) intent ages out instead of " +
      "being deleted on first sight (r15)") {
    val wf = graft.cdc.TxLog.fs(spark, warehouse)
    val md = new org.apache.hadoop.fs.Path(s"$warehouse/partial_t")
    wf.mkdirs(md)
    val ip = new org.apache.hadoop.fs.Path(md, ".location-intent")
    val out = wf.create(ip, true)
    out.write("/only/the/loc/line/so/far".getBytes("UTF-8")); out.close()
    // within the grace the reader treats it as a writer mid-create:
    // the resolution miss leaves it in place (deleting it here would
    // disarm recovery for a writer whose rename lands a moment later)
    intercept[Exception] { sqlc("SELECT * FROM gcat.partial_t") }
    assert(wf.exists(ip),
      "a young unreadable intent must survive the miss path")
    // past the grace it is junk and is reclaimed
    val prevGrace = graft.cdc.TxLog.orphanGraceMs
    graft.cdc.TxLog.orphanGraceMs = 0L
    try intercept[Exception] { sqlc("SELECT * FROM gcat.partial_t") }
    finally graft.cdc.TxLog.orphanGraceMs = prevGrace
    assert(!wf.exists(ip), "an aged unreadable intent is reclaimed")
  }
}
