package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The closed CDC loop with consumer-managed resume (Replicator):
  * replica ≡ source after every sync, catch-up applies a multi-batch
  * range in one merge, a lost offset (crash between merge and offset
  * commit) replays convergently, and an in-between published batch at
  * init time is not double-applied.
  */
class ReplicatorSpec extends SparkSpec {

  import spark.implicits._

  private def changeDf(rs: Seq[(Long, String, Long, Boolean)]) =
    rs.toDF("id", "payload", "version", "deleted")

  private def state(dir: String): Set[(Long, String, Long)] =
    Compaction.read(spark, dir).select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet

  test("replica tracks the source across syncs; catch-up is one merge") {
    val root = tmpDir("replicator")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(
      changeDf((1L to 30L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 8)
    Compaction.merge(spark, src,
      changeDf(Seq((3L, "v1-3", 1L, false))), emitFeed = true)

    Replicator.init(spark, src, dst)
    assert(state(dst) == state(src))
    assert(Replicator.lastApplied(spark, dst) == 0L,
      "init must fence at the published head")
    // no new batches: sync is a no-op at the same position
    assert(Replicator.sync(spark, src, dst) == 0L)
    assert(state(dst) == state(src))

    // two more batches land, including a delete and a re-insert
    Compaction.merge(spark, src, changeDf(Seq(
      (5L, "", 2L, true), (31L, "v2-31", 2L, false))), emitFeed = true)
    Compaction.merge(spark, src, changeDf(Seq(
      (5L, "v3-5", 3L, false), (3L, "v3-3", 3L, false))), emitFeed = true)
    // one catch-up sync applies the whole range
    assert(Replicator.sync(spark, src, dst) == 2L)
    assert(state(dst) == state(src))
    val m = state(dst).map(r => r._1 -> r._2).toMap
    assert(m(5L) == "v3-5" && m(31L) == "v2-31" && m(3L) == "v3-3")
  }

  test("a lost offset replays convergently (crash between merge and commit)") {
    val root = tmpDir("replicator2")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(
      changeDf((1L to 20L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    Replicator.init(spark, src, dst)
    Compaction.merge(spark, src, changeDf(Seq(
      (7L, "v1-7", 1L, false), (9L, "", 1L, true))), emitFeed = true)
    assert(Replicator.sync(spark, src, dst) == 0L)
    val synced = state(dst)
    assert(synced == state(src))
    // simulate the crash window: the replica merge committed but the
    // offset did not — rewind the sync state to the pre-sync position
    val sd = s"$dst/_sync"
    val v = TxLog.latest(spark, sd).get.version
    TxLog.commit(spark, sd, v + 1L, Map("last_batch" -> "-1"))
    assert(Replicator.lastApplied(spark, dst) == -1L)
    // the replayed sync re-applies batch 0 onto an already-applied
    // replica: (key, version) semantics make it a no-op
    assert(Replicator.sync(spark, src, dst) == 0L)
    assert(state(dst) == synced)
  }

  test("sync(upTo) applies only the admitted feed slice") {
    val root = tmpDir("replicator3")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(
      changeDf((1L to 10L).map(i => (i, s"v0-$i", 0L, false))),
      src, "id", "version", "deleted", nBuckets = 4)
    Replicator.init(spark, src, dst)
    // three batches pile up
    (1L to 3L).foreach { v =>
      Compaction.merge(spark, src,
        changeDf(Seq((v, s"v$v", v, false))), emitFeed = true)
    }
    // bounded drain: only batch 0 applies, the offset stops there
    assert(Replicator.sync(spark, src, dst, upTo = 0L) == 0L)
    val m1 = state(dst).map(r => r._1 -> r._2).toMap
    assert(m1(1L) == "v1" && m1(2L) == "v0-2" && m1(3L) == "v0-3",
      s"upTo=0 must apply exactly batch 0: $m1")
    // upTo below the applied position is a no-op, never a rewind
    assert(Replicator.sync(spark, src, dst, upTo = -1L) == 0L)
    // the rest drains; upTo beyond head clamps to head
    assert(Replicator.sync(spark, src, dst, upTo = 99L) == 2L)
    assert(state(dst) == state(src))
  }
}
