package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{Compaction, TxLog}

/** Iceberg-style time partitions on maintained tables (r9 item 3):
  * `PARTITIONED BY (days(ts))` composes with bucket hashing —
  * `bucket=<b>/_tp=<day>` — so time-range scans prune partition dirs
  * by NAME, retention drops whole partitions as metadata-first
  * commits, and the catalog scan derives the day range from pushed
  * filters.
  */
class TimePartitionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, h: Int = 12): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def seed(n: Int): org.apache.spark.sql.DataFrame =
    (1 to n).map(i => (i.toLong, s"p$i", ts(1 + (i - 1) % 20), 0L, false))
      .toDF("id", "payload", "ts", "version", "deleted")

  test("writes land as bucket/_tp dirs; range reads open only matching " +
      "partitions; merges preserve the layout and results stay exact") {
    val dir = tmpDir("tpart")
    Compaction.init(seed(200), dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Nil, feed = false,
      timePartition = Some("days" -> "ts"))
    // merge: move key 5 to day 18 at v1, add key 201 on day 3
    Compaction.merge(spark, dir,
      Seq((5L, "moved", ts(18), 1L, false),
        (201L, "new", ts(3), 1L, false))
        .toDF("id", "payload", "ts", "version", "deleted"))
    val out = Compaction.readTimeRange(spark, dir, ts(3, 0), ts(5, 23))
    val opened = out.inputFiles
    val dayRe = "_tp=([0-9]+)".r
    // 2024-01-03 = epoch day 19725
    assert(opened.nonEmpty && opened.forall(f =>
      dayRe.findFirstMatchIn(f).exists { m =>
        val d = m.group(1).toInt; d >= 19725 && d <= 19727
      }), opened.mkString("\n"))
    assert(opened.length < Compaction.read(spark, dir).inputFiles.length)
    val got = out.select($"id").as[Long].collect().toSet
    val truth = Compaction.read(spark, dir)
      .filter($"ts" >= ts(3, 0) && $"ts" <= ts(5, 23))
      .select($"id").as[Long].collect().toSet
    assert(got == truth)
    assert(got.contains(201L) && !got.contains(5L),
      "the merge's moves must be partition-visible")
  }

  test("dropPartitionsBefore retires partitions metadata-first: counts " +
      "stay exact, the floor fences reads, dirs delete after") {
    val dir = tmpDir("tpart2")
    Compaction.init(seed(200), dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Nil, feed = false,
      timePartition = Some("days" -> "ts"))
    val before = Compaction.countRows(spark, dir)
    assert(before == 200L)
    val expectDropped = Compaction.read(spark, dir)
      .filter($"ts" < ts(6, 0)).count()
    val retired = Compaction.dropPartitionsBefore(spark, dir, ts(6, 0))
    assert(retired > 0, "expected partition dirs to retire")
    // manifest-only count stays exact after the subtraction
    assert(Compaction.countRows(spark, dir) == before - expectDropped)
    assert(Compaction.read(spark, dir).count() == before - expectDropped)
    // the floor is durable and reads fence on it even if dirs linger:
    // re-create a stale dir below the floor — reads must not resurrect
    val fs = TxLog.fs(spark, dir)
    val snap = TxLog.latest(spark, dir).get
    assert(snap.prop("tp_min").exists(_.toInt == 19728), // 2024-01-06
      snap.prop("tp_min").toString)
    val someBucket = snap.buckets.values.head
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$dir/data/$someBucket/_tp=19723"))
    assert(Compaction.read(spark, dir).count() == before - expectDropped)
    // retiring below the recorded floor is a no-op
    assert(Compaction.dropPartitionsBefore(spark, dir, ts(3, 0)) == 0)
    // maintain drives the same path by age (cutoff in the future here:
    // everything left retires)
    val (_, _) = Compaction.maintain(spark, dir,
      maxPartitionAge = java.time.Duration.ofDays(1))
    assert(Compaction.countRows(spark, dir) == 0L)
    assert(Compaction.read(spark, dir).count() == 0L)
  }

  test("a dirty bucket's fold input is never range-pruned: a newer " +
      "out-of-range version must not resurrect the old row") {
    val w = tmpDir("tpart-mor-wh")
    spark.conf.set("spark.sql.catalog.gtpm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtpm.warehouse", w)
    spark.sql("""CREATE TABLE gtpm.ev (
        id BIGINT, payload STRING, ts TIMESTAMP, version BIGINT,
        deleted BOOLEAN)
        PARTITIONED BY (days(ts))
        TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    Seq((1L, "old", ts(10), 0L, false), (2L, "keep", ts(10), 0L, false))
      .toDF("id", "payload", "ts", "version", "deleted")
      .writeTo("gtpm.ev").append()
    // key 1 moves OUT of the queried range via a merge-on-read delta
    // (the delta file lands in _tp=Jan-20; the stale base row stays in
    // _tp=Jan-10 — exactly the shape a range prune on the fold input
    // would resurrect)
    Compaction.merge(spark, s"$w/ev",
      Seq((1L, "moved", ts(20), 1L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      mergeOnRead = true, retainHistory = true)
    val got = spark.sql(
      "SELECT id FROM gtpm.ev WHERE ts >= TIMESTAMP '2024-01-09 00:00:00' " +
        "AND ts <= TIMESTAMP '2024-01-11 00:00:00'")
      .as[Long].collect().toSet
    assert(got == Set(2L),
      s"the superseded in-range row resurrected: $got")
    // and the programmatic range read agrees
    val got2 = Compaction.readTimeRange(spark, s"$w/ev", ts(9, 0),
      ts(11, 0)).select($"id").as[Long].collect().toSet
    assert(got2 == Set(2L), got2.toString)
  }

  test("a NULL partition-source value fails the write loudly") {
    val dir = tmpDir("tpart-null")
    val e = intercept[Exception] {
      Compaction.init(
        Seq((1L, "a", null.asInstanceOf[java.sql.Timestamp], 0L, false))
          .toDF("id", "payload", "ts", "version", "deleted"),
        dir, Seq("id"), "version", "deleted", nBuckets = 2,
        clusterBy = Nil, feed = false,
        timePartition = Some("days" -> "ts"))
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains("must not be null")),
      causes(e).mkString(" | "))
  }

  test("years transform and the RETIRE PARTITIONS SQL verb") {
    val dir = tmpDir("tpart-yr")
    Compaction.init(
      Seq((1L, "a", java.sql.Timestamp.valueOf("2022-06-01 00:00:00"),
          0L, false),
        (2L, "b", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
          0L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 2,
      clusterBy = Nil, feed = false,
      timePartition = Some("years" -> "ts"))
    val fs = TxLog.fs(spark, dir)
    val snap = TxLog.latest(spark, dir).get
    val dirs = snap.buckets.values.flatMap(rel =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data/$rel"))
        .map(_.getPath.getName)).toSet
    assert(dirs == Set("_tp=52", "_tp=54"), dirs.toString) // 2022, 2024
    graft.plans.GraftTables.register(spark, "tpart_yr", dir)
    val out = graft.plans.GraftTables.sql(spark,
      "RETIRE PARTITIONS tpart_yr BEFORE TIMESTAMP '2023-01-01 00:00:00'")
    assert(out.select("partitions_retired").as[Int].head() == 1)
    assert(Compaction.read(spark, dir)
      .select($"id").as[Long].collect().toSet == Set(2L))
    assert(Compaction.countRows(spark, dir) == 1L)
  }

  test("merge-on-read deltas refuse partition retirement until compacted") {
    val dir = tmpDir("tpart3")
    Compaction.init(seed(40), dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Nil, feed = false,
      timePartition = Some("days" -> "ts"))
    Compaction.merge(spark, dir,
      Seq((1L, "d", ts(2), 1L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      mergeOnRead = true)
    val e = intercept[IllegalArgumentException] {
      Compaction.dropPartitionsBefore(spark, dir, ts(6, 0))
    }
    assert(e.getMessage.contains("compact"), e.getMessage)
    Compaction.compact(spark, dir)
    assert(Compaction.dropPartitionsBefore(spark, dir, ts(6, 0)) > 0)
  }

  test("catalog: CREATE PARTITIONED BY (days(ts)), pushed ts filters " +
      "prune partition dirs in the scan plan") {
    val w = tmpDir("tpart-wh")
    spark.conf.set("spark.sql.catalog.gtp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtp.warehouse", w)
    spark.sql("""CREATE TABLE gtp.ev (
        id BIGINT, payload STRING, ts TIMESTAMP, version BIGINT,
        deleted BOOLEAN)
        PARTITIONED BY (days(ts))
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    seed(200).writeTo("gtp.ev").append()
    def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def collect(p: SparkPlan): Seq[BatchScanExec] = p match {
        case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
        case q: QueryStageExec => collect(q.plan)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(collect)
      }
      collect(df.queryExecution.executedPlan).flatMap(
        _.inputPartitions.flatMap {
          case p: GraftCleanPartition =>
            p.files.map(_.filePath.toString).toSeq
          case _ => Nil
        })
    }
    val q = spark.sql(
      "SELECT count(*) AS n, CAST(SUM(id) AS BIGINT) AS s FROM gtp.ev " +
        s"WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' " +
        s"AND ts <= TIMESTAMP '2024-01-05 23:00:00'")
    val pruned = scanFiles(q)
    // the unfiltered twin (id >= -1 defeats the zero-scan COUNT
    // pushdown without pruning anything)
    val all = scanFiles(spark.sql(
      "SELECT count(*) AS n FROM gtp.ev WHERE id >= -1"))
    val dayRe = "_tp=([0-9]+)".r
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"${pruned.size} of ${all.size}")
    assert(pruned.forall(f => dayRe.findFirstMatchIn(f).exists { m =>
      val d = m.group(1).toInt; d >= 19725 && d <= 19727
    }), pruned.mkString("\n"))
    // and the answer is exact
    val (n, s) = q.as[(Long, Long)].head()
    val ids = (1 to 200).filter(i => { val d = 1 + (i - 1) % 20
      d >= 3 && d <= 5 })
    assert(n == ids.size && s == ids.map(_.toLong).sum, (n, s).toString)
  }
}
