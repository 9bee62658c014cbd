package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The change feed across schema evolution: batches written BEFORE an
  * ALTER (rename / widen / add) must read back under the CURRENT
  * logical schema — renamed columns resolve their historical
  * spellings, narrow files widen, added columns null-extend — for
  * BOTH the batch reader (`readFeed`, and with it `Replicator.sync`)
  * and the changelog stream.
  */
class FeedEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def mk(dir: String): Unit =
    Compaction.init(
      (0L until 10L).map(i => (i, i.toInt, s"p$i", 0L, false))
        .toDF("id", "qty", "payload", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", 4, Nil, feed = true)

  test("readFeed resolves renamed, widened, and added columns across batches") {
    val dir = tmpDir("feed-evo") + "/t"
    mk(dir)
    // batch 0: pre-evolution (qty INT, payload named 'payload')
    Compaction.merge(spark, dir,
      Seq((1L, 11, "p1b", 1L, false))
        .toDF("id", "qty", "payload", "version", "deleted"),
      retainHistory = true)
    Compaction.alterSchema(spark, dir, Seq(
      Compaction.SchemaChange.RenameColumn("payload", "body"),
      Compaction.SchemaChange.WidenColumn("qty",
        org.apache.spark.sql.types.LongType),
      Compaction.SchemaChange.AddColumn("score",
        org.apache.spark.sql.types.DoubleType)))
    // batch 1: post-evolution (qty BIGINT, 'body', 'score')
    Compaction.merge(spark, dir,
      Seq((2L, 7000000000L, "b2", Some(0.5), 1L, false))
        .toDF("id", "qty", "body", "score", "version", "deleted"),
      retainHistory = true)

    val feed = Compaction.readFeed(spark, dir)
    // manifest order: ADD COLUMN appends (score lands after deleted)
    assert(feed.columns.toSeq ==
      Seq("id", "qty", "body", "version", "deleted", "score",
        "_change_type", "batch"),
      s"feed must read under the CURRENT logical schema, got " +
        feed.columns.mkString(", "))
    val rows = feed
      .filter($"_change_type" === "update_postimage")
      .select("id", "qty", "body", "score")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(rows == Set(
      (1L, 11L, "p1b", None),       // pre-evolution batch, resolved
      (2L, 7000000000L, "b2", Some(0.5))),
      s"got $rows")
  }

  test("Replicator.sync catches up across a rename+widen on the source") {
    val src = tmpDir("feed-evo-rep") + "/src"
    val dst = tmpDir("feed-evo-rep") + "/dst"
    mk(src)
    Replicator.init(spark, src, dst)
    // batch: pre-evolution update
    Compaction.merge(spark, src,
      Seq((3L, 33, "p3b", 1L, false))
        .toDF("id", "qty", "payload", "version", "deleted"),
      retainHistory = true)
    Compaction.alterSchema(spark, src, Seq(
      Compaction.SchemaChange.RenameColumn("payload", "body"),
      Compaction.SchemaChange.WidenColumn("qty",
        org.apache.spark.sql.types.LongType)))
    // the replica must evolve the same way before catching up (its
    // own ALTER — schema changes are table ops, not feed events)
    Compaction.alterSchema(spark, dst, Seq(
      Compaction.SchemaChange.RenameColumn("payload", "body"),
      Compaction.SchemaChange.WidenColumn("qty",
        org.apache.spark.sql.types.LongType)))
    Compaction.merge(spark, src,
      Seq((4L, 8000000000L, "b4", 2L, false))
        .toDF("id", "qty", "body", "version", "deleted"),
      retainHistory = true)
    Replicator.sync(spark, src, dst)
    def state(d: String) = Compaction.read(spark, d)
      .select("id", "qty", "body")
      .as[(Long, Long, String)].collect().toSet
    assert(state(dst) == state(src),
      "replica must equal source across the evolution")
    assert(state(dst).contains((3L, 33L, "p3b")))
    assert(state(dst).contains((4L, 8000000000L, "b4")))
  }
}
