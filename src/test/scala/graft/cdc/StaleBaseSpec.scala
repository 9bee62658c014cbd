package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Read-modify-write fencing (`expectedBase`) and commit lineage
  * (`txn_id`/`base_txn`): a changelog derived from snapshot v must not
  * commit over a table that advanced past v (lost update), the OCC
  * loop must NOT generically retry that condition (only the caller can
  * rebuild the changelog), and every commit records which txn it built
  * on so the vacuum fence can tell "my slot was vacated" from "my
  * commit was consumed then vacuumed".
  */
class StaleBaseSpec extends SparkSpec {

  import spark.implicits._

  private def changeDf(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("id", "payload", "version", "deleted")

  private def freshTable(tag: String): String = {
    val dir = tmpDir(s"stale-$tag") + "/t"
    Compaction.init(
      changeDf((1L to 20L).map(i => (i, s"v0-$i", 0L, false))),
      dir, "id", "version", "deleted", nBuckets = 4)
    dir
  }

  test("merge with a stale expectedBase throws StaleBase and commits nothing") {
    val dir = freshTable("fence")
    val base = Compaction.version(spark, dir)
    // a concurrent writer advances the table past our pinned base
    Compaction.merge(spark, dir, changeDf(Seq((1L, "other", 1L, false))))
    val advanced = Compaction.version(spark, dir)
    assert(advanced == base + 1)

    val stale = changeDf(Seq((1L, "stale-overwrite", 0L, false)))
    intercept[TxLog.StaleBase] {
      Compaction.merge(spark, dir, stale, expectedBase = Some(base))
    }
    // nothing committed: version unchanged, the concurrent write intact
    assert(Compaction.version(spark, dir) == advanced)
    val m = Compaction.read(spark, dir).select($"id", $"payload")
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "other")
  }

  test("merge with the current expectedBase commits normally") {
    val dir = freshTable("ok")
    val base = Compaction.version(spark, dir)
    val stats = Compaction.merge(spark, dir,
      changeDf(Seq((2L, "pinned", 1L, false))), expectedBase = Some(base))
    assert(stats.rowsWritten > 0)
    assert(Compaction.version(spark, dir) == base + 1)
    val m = Compaction.read(spark, dir).select($"id", $"payload")
      .as[(Long, String)].collect().toMap
    assert(m(2L) == "pinned")
  }

  test("StaleBase escapes withOcc without a generic retry") {
    val dir = freshTable("occ")
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[TxLog.StaleBase] {
      TxLog.withOcc(spark, dir) {
        attempts.incrementAndGet()
        throw new TxLog.StaleBase("derived at v0 but table is at v1")
      }
    }
    assert(attempts.get() == 1,
      s"withOcc must not retry StaleBase; body ran ${attempts.get()} times")
  }

  test("commits chain lineage: each manifest's base_txn is its parent's txn_id") {
    val dir = freshTable("lineage")
    Compaction.merge(spark, dir,
      changeDf(Seq((3L, "a", 1L, false))), retainHistory = true)
    Compaction.merge(spark, dir,
      changeDf(Seq((3L, "b", 2L, false))), retainHistory = true)
    val versions = TxLog.versionsOnDisk(spark, dir)
    assert(versions.size >= 3)
    val snaps = versions.map(v =>
      v -> TxLog.read(spark, dir, v).props)
    snaps.sliding(2).foreach { case Seq((pv, pp), (cv, cp)) =>
      assert(pp.contains("txn_id"), s"v$pv missing txn_id")
      assert(cp.get("base_txn").contains(pp("txn_id")),
        s"v$cv base_txn=${cp.get("base_txn")} != v$pv txn_id=${pp.get("txn_id")}")
    }
  }

  test("readWithVersion pins the snapshot the rows came from") {
    val dir = freshTable("pin")
    val (v, df) = Compaction.readWithVersion(spark, dir)
    assert(v == Compaction.version(spark, dir))
    assert(df.count() == 20)
  }
}
