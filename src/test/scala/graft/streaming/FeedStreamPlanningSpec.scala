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
