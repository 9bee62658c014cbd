package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.{Compaction, Replicator}

/** Streaming replication (StreamingReplicator): the replica tracks the
  * source across drains driven by the feed file stream, resumes from
  * its own offset after a restart, and converges under replayed
  * micro-batches — the scheduling layer must add NO new state beyond
  * the checkpoint it already gets for free.
  */
class StreamingReplicatorSpec extends SparkSpec {

  import spark.implicits._

  private def changeDf(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("id", "payload", "version", "deleted")

  private def state(dir: String): Set[(Long, String, Long)] =
    Compaction.read(spark, dir).select($"id", $"payload", $"version")
      .as[(Long, String, Long)].collect().toSet

  test("replica tracks the source across drains and restarts") {
    val root = tmpDir("sreplica")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(
      changeDf((1L to 30L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    // one pre-clone feed batch: init's fence must keep the stream from
    // double-applying it
    Compaction.merge(spark, src,
      changeDf(Seq((1L, "v1-1", 1L, false))), emitFeed = true)
    Replicator.init(spark, src, dst)

    def drain(): Unit = {
      val q = StreamingReplicator.replicaStream(spark, src, dst)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    // drain with nothing new: the pre-clone batch's files are in the
    // stream, but the offset fence makes the sync a no-op
    drain()
    assert(state(dst) == state(src))

    // two source merges land while the stream is down; one drain
    // catches up both (update + delete + insert)
    Compaction.merge(spark, src,
      changeDf(Seq((2L, "v2-2", 2L, false), (3L, "", 2L, true))),
      emitFeed = true)
    Compaction.merge(spark, src,
      changeDf(Seq((31L, "v3-31", 3L, false))), emitFeed = true)
    drain()
    assert(state(dst) == state(src))
    assert(!state(dst).exists(_._1 == 3L), "delete must replicate")
    assert(state(dst).exists(_._1 == 31L), "insert must replicate")

    // restarted stream (same checkpoint): nothing re-applies, and a
    // further merge still flows
    Compaction.merge(spark, src,
      changeDf(Seq((31L, "v4-31", 4L, false))), emitFeed = true)
    drain()
    assert(state(dst) == state(src))
  }
}
