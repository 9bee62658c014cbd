package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The failure-mode contracts of the maintained-table family: vacuum
  * must never reset history/feed numbering (meta counters outlive the
  * directories), readAsOf must refuse vacuumed versions instead of
  * returning a mixed-state frame, a crashed merge's staging leftovers
  * must not poison the next merge, a fully-retracted AggView must stay
  * readable and mergeable, and reserved internal column names are
  * rejected up front.
  */
class DurabilitySpec extends SparkSpec {

  import spark.implicits._

  private def users(range: Range, v: Long) =
    range.map(i => (i.toLong, s"u$i-v$v", v, false))
      .toDF("id", "payload", "version", "deleted")

  test("feed numbering survives a vacuum of every feed batch") {
    val dir = tmpDir("dur-feed") + "/t"
    Compaction.init(users(1 to 40, 0), dir, "id", "version", "deleted",
      nBuckets = 4)
    Compaction.merge(spark, dir, users(1 to 10, 1), emitFeed = true)
    Compaction.merge(spark, dir, users(5 to 15, 2), emitFeed = true)
    // a consumer has resumed past batch 1; vacuum everything
    Compaction.vacuum(spark, dir, keepFromVersion = 0L, feedBefore = 99L)
    Compaction.merge(spark, dir, users(8 to 12, 3), emitFeed = true)
    val batches = Compaction.readFeed(spark, dir)
      .select($"batch").distinct().as[Long].collect().toSet
    // the post-vacuum batch must continue at 2, not restart at 0
    assert(batches == Set(2L))
  }

  test("history numbering survives a full vacuum; readAsOf refuses vacuumed versions") {
    val dir = tmpDir("dur-hist") + "/t"
    Compaction.init(users(1 to 40, 0), dir, "id", "version", "deleted",
      nBuckets = 4)
    Compaction.merge(spark, dir, users(1 to 10, 1), retainHistory = true)
    Compaction.merge(spark, dir, users(5 to 15, 2), retainHistory = true)
    assert(Compaction.versions(spark, dir) == Seq(0L, 1L))
    Compaction.vacuum(spark, dir, keepFromVersion = 5L)
    assert(Compaction.versions(spark, dir).isEmpty)
    // pre-vacuum versions now refuse instead of silently mixing states
    val e = intercept[IllegalArgumentException] {
      Compaction.readAsOf(spark, dir, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
    // the next retaining merge must continue at v=2, not restart at 0
    Compaction.merge(spark, dir, users(8 to 12, 3), retainHistory = true)
    assert(Compaction.versions(spark, dir) == Seq(2L))
    // version 2 = state BEFORE that merge = state after merges 1+2
    val asOf2 = Compaction.readAsOf(spark, dir, 2L)
      .filter($"id" === 10L).select($"payload").as[String].collect()
    assert(asOf2.toSeq == Seq("u10-v2"))
  }

  test("stale staging from a crashed merge is ignored and cleaned") {
    val dir = tmpDir("dur-staging") + "/t"
    Compaction.init(users(1 to 20, 0), dir, "id", "version", "deleted",
      nBuckets = 4)
    // simulate a merge that died after staging: plant junk
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.staging/data/bucket=0"))
    val stats = Compaction.merge(spark, dir, users(1 to 5, 1))
    assert(stats.rowsWritten > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.staging")))
    val got = Compaction.read(spark, dir)
      .filter($"id" === 3L).select($"payload").as[String].collect()
    assert(got.toSeq == Seq("u3-v1"))
  }

  test("fully-retracted AggView stays readable and mergeable") {
    val dir = tmpDir("dur-aggview") + "/v"
    val rows = Seq((1L, 10.0), (2L, 20.0))
    AggView.init(rows.toDF("k", "v"), dir, "k", "v", nBuckets = 2)
    // retract everything via a feed of deletes
    val feed = rows.toDF("k", "v")
      .withColumn("_change_type", lit("delete"))
    AggView.applyFeed(spark, dir, feed, batchId = 0L)
    assert(AggView.read(spark, dir).count() == 0L) // empty, no throw
    // and the view keeps working afterward
    AggView.merge(spark, dir, Seq((3L, 5.0)).toDF("k", "v"), batchId = 1L)
    val back = AggView.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(back == Seq((3L, 1L)))
  }

  test("reserved internal column names are rejected at init") {
    val bad = Seq((1L, "x", 0L, false, 7))
      .toDF("id", "payload", "version", "deleted", "bucket")
    intercept[IllegalArgumentException] {
      Compaction.init(bad, tmpDir("dur-res") + "/t", "id", "version",
        "deleted", nBuckets = 2)
    }
    val badScd = Seq((1L, "x", 0L, false, true))
      .toDF("id", "payload", "version", "deleted", "is_current")
    intercept[IllegalArgumentException] {
      Scd2.init(badScd, tmpDir("dur-res2") + "/t", "id", "version",
        "deleted", nBuckets = 2)
    }
    intercept[IllegalArgumentException] {
      AggView.init(Seq((1L, 2.0)).toDF("cnt", "v"),
        tmpDir("dur-res3") + "/v", "cnt", "v", nBuckets = 2)
    }
  }
}
