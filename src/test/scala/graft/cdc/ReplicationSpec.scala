package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC replication closed over the engine's own operators: a replica
  * table that merges `feedAsChangelog` slices of the source's change
  * data feed equals the source after every batch — including deletes
  * (preimage-version tombstones winning on the equal-version
  * tie-break) and keys resurrected after deletion.
  */
class ReplicationSpec extends SparkSpec {

  import spark.implicits._

  private def changeDf(rs: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rs.toDF("id", "payload", "version", "deleted")

  private def rows(dir: String): Set[(Long, String, Long)] =
    Compaction.read(spark, dir).select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet

  test("replica merging the feed tracks the source exactly") {
    val root = tmpDir("repl")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val snapshot = changeDf((1L to 30L).map(i => (i, s"v0-$i", 0L, false)))
    Compaction.init(snapshot, src, "id", "version", "deleted", nBuckets = 8)
    // replica seeded from the same snapshot (a one-time full copy; the
    // feed carries everything after that)
    Compaction.init(snapshot, dst, "id", "version", "deleted", nBuckets = 8)

    val batches = Seq(
      // update + insert + delete
      Seq((3L, "v1-3", 1L, false), (31L, "v1-31", 1L, false),
        (8L, "", 1L, true)),
      // resurrect the deleted key, delete a key updated in batch 0
      Seq((8L, "v2-8", 2L, false), (3L, "", 2L, true)),
      // stale change: version 0 < stored version 1 loses at the
      // source, so the feed carries nothing and the replica holds
      // (equal version would WIN — the ON CONFLICT tie-break)
      Seq((31L, "stale", 0L, false)),
      Seq((31L, "v3-31", 3L, false)))

    batches.zipWithIndex.foreach { case (b, i) =>
      // every merge emits a numbered feed batch, even an all-stale one
      // (empty — no table effect), so merge index == feed batch id
      Compaction.merge(spark, src, changeDf(b), emitFeed = true)
      val slice = Compaction.readFeed(spark, src)
        .filter(col("batch") === i)
      Compaction.merge(spark, dst,
        Compaction.feedAsChangelog(slice, "deleted"))
      assert(rows(dst) == rows(src), s"replica diverged after batch $i")
    }
    // semantics spot-checks on the final state
    val m = rows(src).map(r => r._1 -> r._2).toMap
    assert(m(8L) == "v2-8" && !m.contains(3L) && m(31L) == "v3-31")
  }

  test("one-pass catch-up resolves same-version insert/delete by feed order") {
    val root = tmpDir("repl-order")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Compaction.init(changeDf(Nil), src, "id", "version", "deleted",
      nBuckets = 4)
    Compaction.init(changeDf(Nil), dst, "id", "version", "deleted",
      nBuckets = 4)
    // batch 0: insert k at version 5; batch 1: a tombstone at the
    // SAME version (a v2 DELETE's feed event carries the pre-image's
    // version — no user version bump exists for it). Applying both
    // batches in ONE merge must land the DELETE: the feed order is
    // the only ordering information, and feedAsChangelog's `_order`
    // carries it.
    Compaction.merge(spark, src,
      changeDf(Seq((7L, "ins", 5L, false))), emitFeed = true)
    Compaction.merge(spark, src,
      changeDf(Seq((7L, "ins", 5L, true))), emitFeed = true)
    Compaction.merge(spark, dst, Compaction.feedAsChangelog(
      Compaction.readFeed(spark, src), "deleted"))
    assert(rows(dst).isEmpty,
      s"the later delete must win the same-version tie, got ${rows(dst)}")
    assert(rows(dst) == rows(src))

    // the mirror order: insert → delete → re-insert at ONE version
    // across three batches, drained in one pass — the re-insert wins
    Compaction.merge(spark, src,
      changeDf(Seq((9L, "in", 5L, false))), emitFeed = true)
    Compaction.merge(spark, src,
      changeDf(Seq((9L, "in", 5L, true))), emitFeed = true)
    Compaction.merge(spark, src,
      changeDf(Seq((9L, "back", 5L, false))), emitFeed = true)
    Compaction.merge(spark, dst, Compaction.feedAsChangelog(
      Compaction.readFeed(spark, src)
        .filter(col("batch") >= 2), "deleted"))
    assert(rows(dst) == rows(src))
    assert(rows(dst) == Set((9L, "back", 5L)))

    // the MERGE-ON-READ consumer path: delta files cannot express
    // intra-batch order, so the _order pre-reduce must land the same
    // outcome before staging (and the folded read must agree)
    val dstMor = s"$root/dst-mor"
    Compaction.init(changeDf(Nil), dstMor, "id", "version", "deleted",
      nBuckets = 4)
    Compaction.merge(spark, dstMor, Compaction.feedAsChangelog(
      Compaction.readFeed(spark, src), "deleted"), mergeOnRead = true)
    assert(rows(dstMor) == rows(src),
      s"MoR one-pass catch-up diverged: ${rows(dstMor)} vs ${rows(src)}")
  }
}
