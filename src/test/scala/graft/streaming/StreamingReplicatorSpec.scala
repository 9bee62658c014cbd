package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.{Compaction, Replicator}

/** Streaming replication (StreamingReplicator): the replica tracks the
  * source across drains driven by the DSv2 feed-batch source (offsets
  * = feed batch ids), resumes from its own offset after a restart, and
  * converges under replayed micro-batches — the scheduling layer must
  * add NO new state beyond the checkpoint it already gets for free.
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

  test("feed source emits exactly the published batch ids as offsets") {
    val root = tmpDir("feedsource")
    val src = s"$root/src"
    Compaction.init(
      changeDf((1L to 10L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    (1L to 3L).foreach { v =>
      Compaction.merge(spark, src,
        changeDf(Seq((v, s"v$v", v, false))), emitFeed = true)
    }
    val q = spark.readStream
      .format(classOf[FeedBatchSource].getName)
      .option("path", src)
      .load()
      .writeStream
      .format("memory")
      .queryName("feed_ids")
      .option("checkpointLocation", s"$root/ckpt-ids")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    val ids = spark.table("feed_ids").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L), s"wrong batch ids: $ids")
  }

  test("maxBatchesPerTrigger rate-limits catch-up into multiple micro-batches") {
    val root = tmpDir("feedratelimit")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(
      changeDf((1L to 10L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    Replicator.init(spark, src, dst)
    // 4 feed batches pile up while the replica is down
    (1L to 4L).foreach { v =>
      Compaction.merge(spark, src,
        changeDf(Seq((v, s"v$v", v, false))), emitFeed = true)
    }
    val dstVersionBefore = Compaction.version(spark, dst)
    val q = StreamingReplicator.replicaStream(spark, src, dst,
        maxBatchesPerTrigger = 1L)
      .option("checkpointLocation", s"$root/ckpt-rl")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    assert(state(dst) == state(src))
    // admission control bounds APPLIED work, not just stream offsets:
    // each rate-limited micro-batch merged exactly its one admitted
    // feed batch, so the replica advanced 4 versions (4 merges) —
    // an unbounded first sync would have drained the backlog in ONE
    // merge and left the replica at +1
    assert(Compaction.version(spark, dst) == dstVersionBefore + 4,
      s"expected 4 bounded merges, replica went " +
        s"$dstVersionBefore -> ${Compaction.version(spark, dst)}")
  }

  test("emitRows mode streams the change rows themselves, exactly-once across restart") {
    val root = tmpDir("feedrows")
    val src = s"$root/src"
    val sinkDir = s"$root/sink"
    Compaction.init(
      changeDf((1L to 20L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    Compaction.merge(spark, src,
      changeDf(Seq((1L, "v1-1", 1L, false), (2L, "", 1L, true))),
      emitFeed = true)

    def drain(): Unit = {
      val q = spark.readStream
        .format(classOf[FeedBatchSource].getName)
        .option("path", src)
        .option("emitRows", "true")
        .load()
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    drain()
    val got1 = spark.read.parquet(sinkDir)
      .select($"id", $"payload", $"_change_type", $"batch")
      .as[(Long, String, String, Long)].collect().toSet
    // batch 0: update of key 1 (pre+post image) + delete of key 2
    assert(got1 == Set(
      (1L, "v0-1", "update_preimage", 0L),
      (1L, "v1-1", "update_postimage", 0L),
      (2L, "v0-2", "delete", 0L)), s"got $got1")

    // restart after a new publish: only batch 1's rows append (the
    // checkpointed offset fences batch 0 — exactly-once)
    Compaction.merge(spark, src,
      changeDf(Seq((30L, "v2-30", 2L, false))), emitFeed = true)
    drain()
    val got2 = spark.read.parquet(sinkDir)
      .select($"id", $"_change_type", $"batch")
      .as[(Long, String, Long)].collect().toList
    assert(got2.size == 4, s"replay duplicated rows: $got2")
    assert(got2.count(_._3 == 1L) == 1)
    assert(got2.contains((30L, "insert", 1L)))

    // a drain with nothing new appends nothing
    drain()
    assert(spark.read.parquet(sinkDir).count() == 4)
  }
}
