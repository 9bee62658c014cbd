package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.cdc.{Compaction, TxLog}

/** Driver-side planning behavior of the feed micro-batch stream
  * (r9 advice + r10 item 6):
  *
  *  - admission is CONTIGUOUS-PUBLISHED: the offset never advances
  *    across a committed batch whose directory is missing (a writer
  *    crashed between commit and publish), so consumers hold at the
  *    gap instead of skipping it forever, and resume when the publish
  *    is repaired;
  *  - per-batch file listings memoize (batches are immutable once
  *    published): re-planning the same offset range performs no new
  *    listing, and a steady-state trigger never lists `feed/`.
  */
class FeedStreamPlanningSpec extends SparkSpec {

  import spark.implicits._

  private def initTable(dir: String): Unit =
    Compaction.init(
      Seq((1L, "v0-1", 0L, false)).toDF("id", "payload", "version",
        "deleted"),
      dir, key = "id", versionCol = "version", deleteCol = "deleted",
      nBuckets = 2)

  private def mergeOne(dir: String, id: Long, v: Long): Unit =
    Compaction.merge(spark, dir,
      Seq((id, s"v$v-$id", v, false))
        .toDF("id", "payload", "version", "deleted"),
      emitFeed = true, retainHistory = true)

  private def dataRowStream(dir: String): FeedBatchStream =
    new FeedBatchStream(dir, None, -1L,
      rowSchema = Some(StreamingReplicator.feedSchema(spark, dir)
        .add("batch", LongType, nullable = false)))

  test("offsets never advance across an unpublished batch; they " +
      "resume once it is republished") {
    val dir = tmpDir("fsp")
    initTable(dir)
    mergeOne(dir, 10L, 1L) // batch 0
    mergeOne(dir, 11L, 2L) // batch 1
    mergeOne(dir, 12L, 3L) // batch 2
    val fs = TxLog.fs(spark, dir)
    // simulate the commit-to-publish crash window on batch 1
    val hidden = new Path(s"$dir/.hidden-batch")
    assert(fs.rename(new Path(s"$dir/feed/batch=1"), hidden))
    val s = dataRowStream(dir)
    val start = s.deserializeOffset("-1")
    val end = s.latestOffset(start, ReadLimit.allAvailable())
    assert(end.json == "0", s"admitted past the gap: ${end.json}")
    // the admitted range plans fine
    assert(s.planInputPartitions(start, end).nonEmpty)
    // the gap heals -> the SAME stream resumes beyond it
    assert(fs.rename(hidden, new Path(s"$dir/feed/batch=1")))
    val end2 = s.latestOffset(end, ReadLimit.allAvailable())
    assert(end2.json == "2", s"did not resume past the healed gap: ${end2.json}")
  }

  test("a re-planned offset range performs no new batch-dir listing") {
    val dir = tmpDir("fsp")
    initTable(dir)
    mergeOne(dir, 10L, 1L) // batch 0
    mergeOne(dir, 11L, 2L) // batch 1
    val s = dataRowStream(dir)
    val start = s.deserializeOffset("-1")
    val end = s.latestOffset(start, ReadLimit.allAvailable())
    assert(end.json == "1")
    val first = s.planInputPartitions(start, end)
    assert(first.nonEmpty)
    val listed = s.listings.get()
    assert(listed == 2L, s"expected one listing per batch, got $listed")
    // restart replay / task retry re-plans the same range: cache hit
    val again = s.planInputPartitions(start, end)
    assert(again.map(_.toString).toSeq == first.map(_.toString).toSeq)
    assert(s.listings.get() == listed,
      "re-planning the same range re-listed an immutable batch dir")
    // a LATER range lists only its own (new) batch
    mergeOne(dir, 12L, 3L) // batch 2
    val end2 = s.latestOffset(end, ReadLimit.allAvailable())
    assert(end2.json == "2")
    s.planInputPartitions(end, end2)
    assert(s.listings.get() == listed + 1L)
  }

  test("time-bounded consumers of a partitioned table's feed plan only " +
      "in-range _tp dirs (r10 item 7)") {
    val dir = tmpDir("fsp-tp")
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    Compaction.init(
      Seq((1L, "seed", ts(1), 0L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 2,
      clusterBy = Nil, feed = true,
      timePartition = Some("days" -> "ts"))
    // one merge touching THREE days: the batch nests three _tp dirs
    Compaction.merge(spark, dir,
      Seq((10L, "a", ts(2), 1L, false), (11L, "b", ts(9), 1L, false),
        (12L, "c", ts(17), 1L, false))
        .toDF("id", "payload", "ts", "version", "deleted"))
    def stream(bounds: Option[(String, String)]) =
      new FeedBatchStream(dir, None, -1L,
        rowSchema = Some(StreamingReplicator.feedSchema(spark, dir)
          .add("batch", LongType, nullable = false)),
        tpPrune = bounds.flatMap { case (lo, hi) =>
          FeedBatchSource.tpPruneOf(dir, Some(lo), Some(hi)) })
    def plannedDays(s: FeedBatchStream): Set[Int] = {
      val start = s.deserializeOffset("-1")
      val end = s.latestOffset(start, ReadLimit.allAvailable())
      s.planInputPartitions(start, end).flatMap {
        case p: FeedFilePartition =>
          "_tp=([0-9]+)".r.findFirstMatchIn(p.path).map(_.group(1).toInt)
        case _ => None
      }.toSet
    }
    // unbounded: all three days' files plan
    assert(plannedDays(stream(None)) ==
      Set(19722 + 2, 19722 + 9, 19722 + 17))
    // bounded to [day 5, day 12]: only day 9's file plans — the
    // out-of-range _tp dirs are excluded from the file partitions
    assert(plannedDays(stream(Some(
      ("2024-01-05 00:00:00", "2024-01-12 23:59:59")))) ==
      Set(19722 + 9))
    // bounds on a feed batch published under a DIFFERENT transform
    // unit must not prune (the dirs' meaning changed): simulate by
    // renaming the batch's marker unit suffix
    val fs = TxLog.fs(spark, dir)
    val batchDir = new Path(s"$dir/feed/batch=0")
    val marker = fs.listStatus(batchDir).map(_.getPath)
      .find(_.getName.startsWith("_pub-")).get
    assert(fs.rename(marker, new Path(batchDir,
      marker.getName.stripSuffix("-tpdays") + "-tphours")))
    assert(plannedDays(stream(Some(
      ("2024-01-05 00:00:00", "2024-01-12 23:59:59")))) ==
      Set(19722 + 2, 19722 + 9, 19722 + 17),
      "a unit-mismatched batch must not prune")
  }

  test("a planned range whose batch dir vanished is a loud error " +
      "naming the remediation, never a silent skip") {
    val dir = tmpDir("fsp")
    initTable(dir)
    mergeOne(dir, 10L, 1L) // batch 0
    mergeOne(dir, 11L, 2L) // batch 1
    val fs = TxLog.fs(spark, dir)
    val s = dataRowStream(dir)
    val start = s.deserializeOffset("-1")
    val end = s.latestOffset(start, ReadLimit.allAvailable())
    assert(end.json == "1")
    // deleted AFTER admission (e.g. out-of-band), not by retention
    assert(fs.delete(new Path(s"$dir/feed/batch=1"), true))
    val e = intercept[IllegalStateException] {
      s.planInputPartitions(s.deserializeOffset("0"), end)
    }
    assert(e.getMessage.contains("repairFeed"), e.getMessage)
  }
}
