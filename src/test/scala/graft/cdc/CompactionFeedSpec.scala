package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change data feed semantics of Compaction.merge(emitFeed = true):
  * the feed is the row-level delta the merge applied to the table —
  * inserts carry postimages, updates carry preimage+postimage pairs,
  * deletes carry the removed row — and inputs with no table effect
  * (losing changelog rows, tombstones for absent keys) emit nothing.
  * Batches accumulate under `feed/batch=N` so a consumer can resume
  * from any batch id with a partition-pruned read.
  */
class CompactionFeedSpec extends SparkSpec {

  import spark.implicits._

  private def initTable(dir: String): Unit =
    Compaction.init(
      Seq((1L, "v0-1", 0L, false), (2L, "v0-2", 0L, false),
        (3L, "v0-3", 0L, false))
        .toDF("id", "payload", "version", "deleted"),
      dir, key = "id", versionCol = "version", deleteCol = "deleted",
      nBuckets = 4)

  private def feed(dir: String): Set[(Long, String, Long, String, Int)] =
    Compaction.readFeed(spark, dir)
      .select(col("id"), col("payload"), col("version"),
        col("_change_type"), col("batch"))
      .as[(Long, String, Long, String, Int)].collect().toSet

  test("insert / update / delete classification with pre- and postimages") {
    val dir = tmpDir("cdf")
    initTable(dir)
    val stats = Compaction.merge(spark, dir,
      Seq(
        (2L, "v1-2", 1L, false),  // update
        (9L, "v1-9", 1L, false),  // insert (new key)
        (3L, "", 1L, true),       // delete
        (77L, "", 1L, true))      // tombstone for absent key: no effect
        .toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    assert(stats.feedRows == 4L)
    // the delete event keeps the pre-image's VALUES but carries the
    // TOMBSTONE's version (1, not the stored row's 0): the delete
    // happened at that version, so a consumer merging several batches
    // in one pass orders it correctly after the insert it supersedes
    assert(feed(dir) == Set(
      (2L, "v0-2", 0L, "update_preimage", 0),
      (2L, "v1-2", 1L, "update_postimage", 0),
      (9L, "v1-9", 1L, "insert", 0),
      (3L, "v0-3", 1L, "delete", 0)))
  }

  test("a changelog row that loses the version race emits no feed row") {
    val dir = tmpDir("cdf")
    initTable(dir)
    // bring key 1 to version 5 first
    Compaction.merge(spark, dir,
      Seq((1L, "v5-1", 5L, false)).toDF("id", "payload", "version", "deleted"))
    // now a STALE change (version 2 < stored 5): table must not move,
    // feed must be empty for the key
    val stats = Compaction.merge(spark, dir,
      Seq((1L, "stale", 2L, false)).toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    assert(stats.feedRows == 0L)
    assert(Compaction.read(spark, dir).filter(col("id") === 1)
      .select("payload").as[String].head() == "v5-1")
  }

  test("feed batches accumulate with increasing ids and prune by batch") {
    val dir = tmpDir("cdf")
    initTable(dir)
    Compaction.merge(spark, dir,
      Seq((4L, "v1-4", 1L, false)).toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    Compaction.merge(spark, dir,
      Seq((4L, "v2-4", 2L, false)).toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    val f = feed(dir)
    assert(f == Set(
      (4L, "v1-4", 1L, "insert", 0),
      (4L, "v1-4", 1L, "update_preimage", 1),
      (4L, "v2-4", 2L, "update_postimage", 1)))
    // resuming from batch 1: the filter is on the partition column, so
    // only that directory's files are selected
    val resumed = Compaction.readFeed(spark, dir).filter(col("batch") >= 1)
    val parts = resumed.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    assert(parts == Seq(1), s"expected pruned feed read, got $parts")
    assert(resumed.count() == 2L)
  }

  test("replaying the feed's net effect reproduces the table state") {
    val dir = tmpDir("cdf")
    initTable(dir)
    Compaction.merge(spark, dir,
      Seq((1L, "v1-1", 1L, false), (8L, "v1-8", 1L, false),
        (2L, "", 1L, true)).toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    Compaction.merge(spark, dir,
      Seq((8L, "", 2L, true), (3L, "v2-3", 2L, false))
        .toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    // consumer-side materialization: last feed event per key wins
    // (batch, then postimage over preimage within an update pair)
    val events = Compaction.readFeed(spark, dir)
      .filter(col("_change_type") =!= "update_preimage")
    val last = events
      .groupBy(col("id"))
      .agg(max_by(struct(col("payload"), col("version"), col("_change_type")),
        struct(col("batch"), col("version"))).as("s"))
      .filter(col("s._change_type") =!= "delete")
      .select(col("id"), col("s.payload").as("payload"),
        col("s.version").as("version"))
    val replayed = last.as[(Long, String, Long)].collect().toSet
    val table = Compaction.read(spark, dir)
      .select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet
    // keys never touched by a feed batch come from the init snapshot
    val untouchedInit = Set.empty[(Long, String, Long)]
    assert(replayed.subsetOf(table))
    assert((table -- replayed).forall(_._2.startsWith("v0-")),
      s"non-init rows missing from replay: ${table -- replayed} $untouchedInit")
  }

  test("emitFeed=false writes no feed directory; init clears stale feed") {
    val dir = tmpDir("cdf")
    initTable(dir)
    Compaction.merge(spark, dir,
      Seq((1L, "v1-1", 1L, false)).toDF("id", "payload", "version", "deleted"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/feed")))
    Compaction.merge(spark, dir,
      Seq((1L, "v2-1", 2L, false)).toDF("id", "payload", "version", "deleted"),
      emitFeed = true)
    assert(feed(dir).nonEmpty)
    // re-init replaces the table wholesale: the old feed is gone
    initTable(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/feed")))
  }
}
