package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** maintain(): with maintenance on a cadence, N scattered
  * merge-on-read batches can never grow an unbounded delta chain
  * (read amplification bounded by maxDeltasPerBucket) and age-based
  * retention bounds history storage — while results stay identical to
  * the copy-on-write twin.
  */
class MaintainSpec extends SparkSpec {

  import spark.implicits._

  private def changeDf(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("id", "payload", "version", "deleted")

  test("delta chains stay bounded across many scattered MoR merges") {
    val dir = tmpDir("maintain") + "/t"
    val cowDir = tmpDir("maintain-cow") + "/t"
    val init = changeDf((1L to 200L).map(i => (i, s"v0-$i", 0L, false)))
    Compaction.init(init, dir, "id", "version", "deleted", nBuckets = 8)
    Compaction.init(init, cowDir, "id", "version", "deleted", nBuckets = 8)

    val bound = 4
    var maxChainEverAfterMaintain = 0
    (1L to 20L).foreach { v =>
      // one scattered update per round (hits many buckets over time)
      val batch = changeDf(Seq(((v * 37) % 200 + 1, s"u$v", v, false)))
      Compaction.merge(spark, dir, batch, mergeOnRead = true)
      Compaction.merge(spark, cowDir, batch)
      Compaction.maintain(spark, dir, maxDeltasPerBucket = bound)
      val worst = Compaction.deltaStats(spark, dir)
        .map(_._2).maxOption.getOrElse(0)
      maxChainEverAfterMaintain =
        math.max(maxChainEverAfterMaintain, worst)
      assert(worst < bound,
        s"round $v: chain length $worst reached the bound $bound")
    }
    // maintenance actually ran (chains formed and were folded)
    assert(maxChainEverAfterMaintain > 0 ||
      Compaction.deltaStats(spark, dir).isEmpty)
    // and the maintained MoR table equals the CoW twin exactly
    val a = Compaction.read(spark, dir)
      .select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet
    val b = Compaction.read(spark, cowDir)
      .select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }

  test("age-based retention vacuums expired history, keeps the window") {
    val dir = tmpDir("maintain-age") + "/t"
    Compaction.init(changeDf(Seq((1L, "a", 0L, false))), dir,
      "id", "version", "deleted", nBuckets = 4)
    (1L to 3L).foreach { v =>
      Compaction.merge(spark, dir, changeDf(Seq((1L, s"v$v", v, false))),
        retainHistory = true)
    }
    assert(TxLog.versionsOnDisk(spark, dir).size == 4)
    // a 1-hour window keeps everything (all commits are fresh)
    val (_, kept) = Compaction.maintain(spark, dir,
      maxHistoryAge = java.time.Duration.ofHours(1))
    assert(kept == 0)
    assert(TxLog.versionsOnDisk(spark, dir).size == 4)
    // a zero window vacuums all but the latest
    val (_, dropped) = Compaction.maintain(spark, dir,
      maxHistoryAge = java.time.Duration.ZERO)
    assert(dropped == 3, s"dropped $dropped")
    assert(TxLog.versionsOnDisk(spark, dir).size == 1)
    // the table still reads (latest survived)
    assert(Compaction.read(spark, dir).count() == 1)
  }

  test("age-based feed retention drops the expired prefix, numbering survives") {
    val dir = tmpDir("maintain-feed") + "/t"
    Compaction.init(changeDf(Seq((1L, "a", 0L, false))), dir,
      Seq("id"), "version", "deleted", nBuckets = 4, clusterBy = Nil,
      feed = true)
    (1L to 3L).foreach { v =>
      Compaction.merge(spark, dir, changeDf(Seq((1L, s"v$v", v, false))),
        retainHistory = true)
    }
    def batches: Seq[Long] = Compaction.readFeed(spark, dir)
      .select("batch").distinct().as[Long].collect().sorted.toSeq
    assert(batches == Seq(0L, 1L, 2L))
    // a 1-hour window keeps everything (batches are fresh)
    Compaction.maintain(spark, dir,
      maxFeedAge = java.time.Duration.ofHours(1))
    assert(batches == Seq(0L, 1L, 2L))
    // a zero window drops the whole expired prefix
    Compaction.maintain(spark, dir, maxFeedAge = java.time.Duration.ZERO)
    assert(Compaction.readFeed(spark, dir).count() == 0)
    // numbering NEVER restarts: the committed counter outlives the
    // dirs, so a consumer fenced at "batch >= 3" misses nothing
    Compaction.merge(spark, dir, changeDf(Seq((1L, "v4", 4L, false))),
      retainHistory = true)
    assert(batches == Seq(3L))
  }

  test("a replica behind the feed-retention horizon refuses to sync") {
    val src = tmpDir("maintain-feed-rep") + "/src"
    val dst = tmpDir("maintain-feed-rep") + "/dst"
    Compaction.init(changeDf(Seq((1L, "a", 0L, false))), src,
      Seq("id"), "version", "deleted", nBuckets = 4, clusterBy = Nil,
      feed = true)
    Replicator.init(spark, src, dst)
    Compaction.merge(spark, src, changeDf(Seq((1L, "v1", 1L, false))),
      retainHistory = true) // batch 0 — never applied
    Compaction.maintain(spark, src,
      maxFeedAge = java.time.Duration.ZERO) // drops it
    Compaction.merge(spark, src, changeDf(Seq((1L, "v2", 2L, false))),
      retainHistory = true) // batch 1
    val e = intercept[IllegalStateException] {
      Replicator.sync(spark, src, dst)
    }
    assert(e.getMessage.contains("retention"), e.getMessage)
    // re-init re-fences at the live head; sync is then a no-op
    Replicator.init(spark, src, dst)
    Replicator.sync(spark, src, dst)
    assert(Compaction.read(spark, dst).select("payload")
      .as[String].head() == "v2")
  }

  test("no-op maintenance costs no commit (version unchanged)") {
    val dir = tmpDir("maintain-noop") + "/t"
    Compaction.init(changeDf(Seq((1L, "a", 0L, false))), dir,
      "id", "version", "deleted", nBuckets = 4)
    val v = Compaction.version(spark, dir)
    val (folded, vacuumed) = Compaction.maintain(spark, dir,
      maxDeltasPerBucket = 2, java.time.Duration.ofHours(1))
    assert(folded == 0 && vacuumed == 0)
    assert(Compaction.version(spark, dir) == v)
  }

  test("maintain(refreshStats=true) backfills leaf zone maps on a " +
      "legacy manifest without touching data; second pass is free (r15)") {
    val dir = tmpDir("maintain-restat") + "/t"
    // version correlated with the day: every bucket's [minv, maxv]
    // envelope spans all days, so only leaf-granular vminl/vmaxl can
    // prune a version-bound read down to one _tp dir
    val init = (0L until 200L).map { i =>
      (i, s"p$i",
        java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 5} 12:00:00"),
        1L + i % 5, false)
    }.toDF("id", "payload", "ts", "version", "deleted")
    Compaction.init(init, dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Seq("version"), feed = false,
      timePartition = Some(("days", "ts")), ndvP = None)
    val snap0 = TxLog.latest(spark, dir).get
    assert(snap0.props.keysIterator.exists(_.startsWith("vminl.")),
      "current writers record leaf maps at init")
    // fabricate a PRE-r14 manifest: same everything, leaf/sketch stat
    // families stripped — exactly what an old-layout table carries
    val legacy = Seq("vminl.", "vmaxl.", "lvdeg.", "lcdeg.",
      "cndv.", "cnul.")
    val leafCmin = (k: String) =>
      Seq("cmin.", "cmax.").exists { p =>
        k.startsWith(p) && {
          val rest = k.drop(p.length).split('.')
          rest.length >= 3 && rest(1).forall(_.isDigit)
        }
      }
    TxLog.commit(spark, dir, snap0.version + 1,
      snap0.props.filterNot { case (k, _) =>
        legacy.exists(k.startsWith) || leafCmin(k) ||
          Seq("txn_id", "base_txn").contains(k) } +
        ("op" -> "test-strip"))
    assert(!TxLog.latest(spark, dir).get.props.keysIterator
      .exists(_.startsWith("vminl.")))
    // without leaf maps the version-bound read opens every day
    def openedDays(since: Long): Set[String] =
      Compaction.readChangedSince(spark, dir, since).inputFiles
        .flatMap(_.split('/').find(_.startsWith("_tp="))).toSet
    assert(openedDays(4L).size == 5,
      "stripped manifest cannot leaf-prune")
    val filesBefore = Compaction.read(spark, dir).inputFiles.sorted
    val restated = Compaction.refreshStats(spark, dir)
    assert(restated > 0, "the backfill must find stale buckets")
    val snap2 = TxLog.latest(spark, dir).get
    assert(snap2.props.keysIterator.exists(_.startsWith("vminl.")),
      "backfill must record leaf version maps")
    assert(snap2.props.keysIterator.exists(_.startsWith("cndv.")),
      "backfill must record cluster NDV sketches")
    // data untouched: the read plans the SAME committed files
    assert(Compaction.read(spark, dir).inputFiles.sorted.toSeq ==
      filesBefore.toSeq, "a stats backfill must not rewrite data")
    // and the leaf prune engages: version > 4 lives only in day 5
    assert(openedDays(4L).size == 1,
      s"leaf maps must prune the version-bound read, " +
        s"opened ${openedDays(4L)}")
    assert(Compaction.readChangedSince(spark, dir, 4L).count() == 40L)
    // second pass: zero commits, zero Spark jobs (pure prop check)
    val vBefore = TxLog.latestVersion(spark, dir).get
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val (folded, _) = Compaction.maintain(spark, dir,
        refreshStats = true)
      assert(folded == 0)
      Thread.sleep(300) // let any (unexpected) job-start events drain
    } finally spark.sparkContext.removeSparkListener(l)
    assert(TxLog.latestVersion(spark, dir).get == vBefore,
      "a fully-stated table must not commit")
    assert(jobs == 0, s"no-op stats pass must run zero jobs, ran $jobs")
  }

  test("streaming mergeStream with maintainEvery keeps chains bounded") {
    val root = tmpDir("maintain-stream")
    val srcDir = s"$root/changes"
    val tableDir = s"$root/table"
    Compaction.init(
      changeDf((1L to 100L).map(i => (i, s"v0-$i", 0L, false))),
      tableDir, "id", "version", "deleted", nBuckets = 8)
    // 6 change files -> 6 micro-batches (maxFilesPerTrigger=1)
    (1L to 6L).foreach { v =>
      changeDf(Seq((v * 17 % 100 + 1, s"s$v", v, false)))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = graft.cdc.Compaction.read(spark, tableDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = graft.streaming.StreamingCompaction.mergeStream(
        src, tableDir, mergeOnRead = true, maintainEvery = 2,
        maxDeltasPerBucket = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    // chains were folded on the cadence: nothing at/over the bound
    val worst = Compaction.deltaStats(spark, tableDir)
      .map(_._2).maxOption.getOrElse(0)
    assert(worst < 2, s"worst chain $worst")
    // and the table is correct
    val got = Compaction.read(spark, tableDir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    (1L to 6L).foreach { v =>
      assert(got(v * 17 % 100 + 1) == s"s$v" ||
        // a later batch may have overwritten the same key
        (1L to 6L).exists(w => w > v && w * 17 % 100 == v * 17 % 100))
    }
    assert(got.size == 100)
  }
}
