package graft.catalog

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction

/** Metadata tables ([[MetaTables]]): `t.history` / `t.files` /
  * `t.partitions` as driver-computed LocalScans, `t.changes` as a
  * batch-dir-pruned distributed read of the change feed, both the
  * dotted and the `t$suffix` spellings.
  */
class MetaTablesSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-meta-wh")
    spark.conf.set("spark.sql.catalog.mcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def changeBatches(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.collect {
        case p: graft.streaming.FeedFilePartition => p.batch
      }
    }.getOrElse(fail("no BatchScanExec in the changes plan"))

  test("history and files metadata tables reflect commits and layout") {
    sqlc("""CREATE TABLE mcat.mh (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO mcat.mh SELECT id, id * 1.5, 0L, false FROM range(200)")
    sqlc("INSERT INTO mcat.mh SELECT id, id * 2.5, 1L, false FROM range(50)")

    val hist = sqlc("SELECT * FROM mcat.mh.history").collect()
    assert(hist.length >= 2) // at least create + merges retained
    val versions = hist.map(_.getLong(0)).toSeq
    assert(versions == versions.sorted)
    assert(hist.forall(_.getAs[java.sql.Timestamp]("committed_at") != null))
    val ops = hist.map(_.getString(2)).toSet
    assert(ops.exists(_.nonEmpty))
    // live row count on the newest commit matches the table
    assert(hist.last.getAs[Long]("live_rows") == 200L)

    val files = sqlc("SELECT * FROM mcat.mh.files").collect()
    assert(files.nonEmpty)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    files.foreach { r =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        r.getAs[String]("path"))))
      assert(r.getAs[Long]("size_bytes") > 0)
      assert(Set("base", "delta").contains(r.getAs[String]("kind")))
    }
    // suffix spelling resolves to the same rows
    assert(sqlc("SELECT count(*) AS n FROM mcat.`mh$files`")
      .as[Long].head() == files.length.toLong)
    // files size sum matches a direct listing of the data dirs
    assert(files.map(_.getAs[Long]("size_bytes")).sum > 0)
  }

  test("partitions metadata table lists live _tp partitions with starts") {
    sqlc("""CREATE TABLE mcat.mp (
        id BIGINT, ts TIMESTAMP, version BIGINT, deleted BOOLEAN)
        PARTITIONED BY (days(ts))
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("""INSERT INTO mcat.mp SELECT id,
        timestamp'2024-01-10 06:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT)),
        0L, false FROM range(300)""")
    val parts = sqlc("SELECT * FROM mcat.mp.partitions")
      .orderBy("partition").collect()
    // 2024-01-10..12 = days 19732..19734
    assert(parts.map(_.getInt(0)).toSeq == Seq(19732, 19733, 19734))
    parts.foreach { r =>
      assert(r.getAs[String]("unit") == "days")
      assert(r.getAs[Long]("files") > 0 && r.getAs[Long]("size_bytes") > 0)
      // starts_at is the UTC midnight of the partition day
      val expected = java.time.Instant.ofEpochSecond(
        r.getInt(0) * 86400L)
      assert(r.getAs[java.sql.Timestamp]("starts_at").toInstant
        == expected)
    }
    // a flat table has no partitions (empty, not an error)
    assert(sqlc("SELECT * FROM mcat.mh.partitions").count() == 0)
  }

  test("changes table reads the feed with batch-directory pruning") {
    sqlc("""CREATE TABLE mcat.mc (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    // batch 0: 100 inserts; batch 1: 20 updates; batch 2: 10 deletes
    sqlc("INSERT INTO mcat.mc SELECT id, id * 1.0, 0L, false FROM range(100)")
    sqlc("INSERT INTO mcat.mc SELECT id, id * 9.0, 1L, false FROM range(20)")
    // the GraftTables front door: the DELETE lowering that emits
    // feed events (the bare v2 group-replace route has no pre-images)
    graft.plans.GraftTables.sql(spark,
      "DELETE FROM mcat.mc WHERE id >= 90")

    val all = sqlc("SELECT * FROM mcat.mc.changes")
    assert(all.columns.toSeq ==
      Seq("id", "v", "version", "deleted", "_change_type", "batch"))
    val byType = all.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("insert") == 100L)
    assert(byType("update_postimage") == 20L &&
      byType("update_preimage") == 20L)
    assert(byType("delete") == 10L)

    // batch >= 1 opens ONLY batch 1 and 2 directories
    val tail = sqlc("SELECT * FROM mcat.mc.changes WHERE batch >= 1")
    assert(changeBatches(tail).toSet == Set(1L, 2L))
    assert(tail.count() == 50L)
    // equality pins one batch dir
    val one = sqlc("SELECT id FROM mcat.mc.changes WHERE batch = 2")
    assert(changeBatches(one).toSet == Set(2L))
    assert(one.as[Long].collect().sorted.toSeq == (90L to 99L))
    // a small selected range reports its planned bytes, so the join
    // BROADCASTS the changes side instead of shuffling the big table
    val joined = spark.table("mcat.mc")
      .join(sqlc("SELECT id, batch FROM mcat.mc.changes WHERE batch = 2"),
        Seq("id"))
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, joined.queryExecution.executedPlan.toString)
    // matches the programmatic feed read exactly
    val dir = s"$warehouse/mc"
    val expect = Compaction.readFeed(spark, dir)
      .select(col("id"), col("_change_type"),
        col("batch").cast("long").as("batch"))
      .as[(Long, String, Long)].collect().sorted.toSeq
    val got = all.select("id", "_change_type", "batch")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == expect)
  }

  test("changes reads prune _tp dirs from pushed time predicates") {
    sqlc("""CREATE TABLE mcat.mtc (
        id BIGINT, ts TIMESTAMP, version BIGINT, deleted BOOLEAN)
        PARTITIONED BY (days(ts))
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    sqlc("""INSERT INTO mcat.mtc SELECT id,
        timestamp'2024-01-10 06:00:00' + make_interval(0,0,0,CAST(id % 4 AS INT)),
        0L, false FROM range(200)""")
    // WHERE on the partition source column prunes partition dirs
    // INSIDE the feed batch — days 19732..19735, bound keeps 2
    val q = sqlc("""SELECT id FROM mcat.mtc.changes
        WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
          AND ts <= TIMESTAMP '2024-01-12 23:59:59'""")
    val days = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.collect {
        case p: graft.streaming.FeedFilePartition =>
          "_tp=([0-9]+)".r.findFirstMatchIn(p.path).map(_.group(1).toInt)
      }.flatten
    }.getOrElse(fail("no BatchScanExec")).toSet
    assert(days == Set(19733, 19734), s"planned _tp dirs: $days")
    assert(q.count() == 100L) // ids with id % 4 in {1, 2}
  }

  test("SHOW FILES / PARTITIONS / CHANGES verbs serve registered names") {
    import graft.plans.GraftTables
    val dir = tmpDir("meta-show") + "/t"
    val ev = spark.range(120).select(col("id"),
      (expr("timestamp'2024-02-01 06:00:00'") +
        expr("make_interval(0,0,0,CAST(id % 3 AS INT))")).as("ts"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Compaction.init(ev, dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Nil, feed = true,
      timePartition = Some("days" -> "ts"))
    Compaction.merge(spark, dir, ev.filter(col("id") % 5 === 0)
      .withColumn("version", lit(1L)))
    GraftTables.register(spark, "showt", dir)

    val files = GraftTables.sql(spark, "SHOW FILES showt").collect()
    assert(files.nonEmpty &&
      files.forall(_.getAs[Long]("size_bytes") > 0))
    val parts = GraftTables.sql(spark, "SHOW PARTITIONS showt")
      .orderBy("partition").collect()
    // 2024-02-01..03 = days 19754..19756
    assert(parts.map(_.getInt(0)).toSeq == Seq(19754, 19755, 19756))
    // batch range filter prunes to the selected batch dirs AND rows
    // init seeds no feed events; the merge publishes batch 0
    val chg = GraftTables.sql(spark, "SHOW CHANGES showt FROM 0 TO 0")
    assert(chg.select("batch").distinct().as[Int].collect().toSeq
      == Seq(0))
    assert(chg.count() == 48L) // 24 keys x update pre+post images
    // feed-less tables refuse loudly
    val flat = tmpDir("meta-show-nofeed") + "/t"
    Compaction.init(ev, flat, Seq("id"), "version", "deleted",
      nBuckets = 2)
    GraftTables.register(spark, "showflat", flat)
    val e = intercept[Exception] {
      GraftTables.sql(spark, "SHOW CHANGES showflat FROM 0")
    }
    assert(e.getMessage.contains("feed"))
    // retention-deleted range refuses loudly (catalog-route parity),
    // and a read starting at the surviving floor answers
    Compaction.merge(spark, dir, ev.filter(col("id") % 7 === 0)
      .withColumn("version", lit(2L)))
    val live = graft.cdc.TxLog.latestVersion(spark, dir).get
    Compaction.vacuum(spark, dir, live, feedBefore = 1L)
    val er = intercept[Exception] {
      GraftTables.sql(spark, "SHOW CHANGES showt FROM 0")
    }
    assert(er.getMessage.contains("retention"), er.getMessage)
    assert(GraftTables.sql(spark, "SHOW CHANGES showt FROM 1")
      .count() > 0)
  }

  test("unbounded SHOW CHANGES caps at the contiguous published " +
      "prefix across a lost publish; an explicit TO past the gap " +
      "fails loudly (catalog-route parity)") {
    import graft.plans.GraftTables
    import graft.cdc.TxLog
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("meta-show-gap") + "/t"
    val ev = spark.range(40).select(col("id"),
      col("id").cast("double").as("v"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Compaction.init(ev, dir, Seq("id"), "version", "deleted",
      nBuckets = 2, clusterBy = Nil, feed = true)
    // retainHistory: repairFeed resolves the crashed txn through its
    // committed manifest version, which a default vacuum would drop
    def mergeV(v: Long): Unit = Compaction.merge(spark, dir,
      ev.withColumn("version", lit(v)).withColumn("v", col("v") + v),
      retainHistory = true)
    mergeV(1L) // feed batch 0
    mergeV(2L) // feed batch 1
    // fabricate the crashed publish: batch 1's dir back into staging
    val fs = TxLog.fs(spark, dir)
    val snap = TxLog.latest(spark, dir).get
    val txn = snap.prop("feed_txn").get
    val staged = new Path(s"$dir/.staging-$txn/feed")
    fs.mkdirs(staged.getParent)
    assert(fs.rename(new Path(s"$dir/feed/batch=1"), staged))
    mergeV(3L) // feed batch 2 — published, beyond the gap
    GraftTables.register(spark, "showgap", dir)
    // unbounded: serves batches 0..0 (the contiguous published
    // prefix), never a silent middle gap
    val open = GraftTables.sql(spark, "SHOW CHANGES showgap FROM 0")
    assert(open.select("batch").distinct().as[Long].collect().toSeq
      == Seq(0L), "unbounded read must stop at the publish gap")
    // explicit TO reaching past the gap names the remediation
    val e = intercept[Exception] {
      GraftTables.sql(spark, "SHOW CHANGES showgap FROM 0 TO 2")
    }
    assert(e.getMessage.contains("repairFeed"), e.getMessage)
    // repair completes the publish; the unbounded read drains to head
    assert(Compaction.repairFeed(spark, dir) == 1)
    assert(GraftTables.sql(spark, "SHOW CHANGES showgap FROM 0")
      .select("batch").distinct().as[Long].collect().toSet
      == Set(0L, 1L, 2L))
  }

  test("changes read below the retention horizon fails loudly") {
    sqlc("""CREATE TABLE mcat.mr (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2', 'feed'='true')""")
    sqlc("INSERT INTO mcat.mr SELECT id, 1.0, 0L, false FROM range(10)")
    sqlc("INSERT INTO mcat.mr SELECT id, 2.0, 1L, false FROM range(10)")
    sqlc("INSERT INTO mcat.mr SELECT id, 3.0, 2L, false FROM range(10)")
    val dir = s"$warehouse/mr"
    val live = graft.cdc.TxLog.latestVersion(spark, dir).get
    Compaction.vacuum(spark, dir, live, feedBefore = 2L)
    val e = intercept[Exception] {
      sqlc("SELECT * FROM mcat.mr.changes").count()
    }
    assert(e.getMessage.contains("retention") ||
      Option(e.getCause).exists(_.getMessage.contains("retention")))
    // bounded at the surviving floor it reads fine (batch 2 = 10
    // update_preimage + 10 update_postimage events)
    assert(sqlc("SELECT * FROM mcat.mr.changes WHERE batch >= 2")
      .count() == 20L)
  }
}
