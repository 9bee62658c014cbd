package graft.catalog

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.Compaction

/** `spark.readStream.table("graft.ns.t")` — the MICRO_BATCH_READ half
  * of the connector: a feed-enabled table streams its change data
  * feed as a CHANGELOG in the table schema (inserts and update
  * post-images as rows, deletes as tombstone-flagged pre-images),
  * with checkpointed exactly-once resume. Feed events flow from EVERY
  * write surface — catalog INSERT and the v2 row-level DML path
  * included — and `readStream.table(src).writeStream.toTable(dst)`
  * closes the replication loop through nothing but standard API.
  */
class ReadStreamTableSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-rst-wh")
    spark.conf.set("spark.sql.catalog.grst",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grst.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def drainTo(table: String, outDir: String, ckpt: String): Unit = {
    val q = spark.readStream.table(table).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
  }

  test("readStream.table streams the changelog; v2 DML feeds it; checkpoint resumes") {
    sqlc("""CREATE TABLE grst.t (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    sqlc("""INSERT INTO grst.t
        SELECT id, concat('a', id), 0L, false FROM range(10)""")

    val root = tmpDir("grst-out")
    val out = s"$root/data"
    val ckpt = s"$root/ckpt"
    drainTo("grst.t", out, ckpt)
    val first = spark.read.parquet(out)
      .select("id", "name", "deleted")
      .as[(Long, String, Boolean)].collect().toSet
    assert(first == (0L until 10L)
      .map(i => (i, s"a$i", false)).toSet,
      s"initial inserts should stream as changelog rows, got $first")

    // v2 row-level DML (this session has no GraftDml extension): the
    // replace path must emit feed events too
    sqlc("UPDATE grst.t SET name = concat(name, '!'), version = 1 " +
      "WHERE id = 3")
    sqlc("DELETE FROM grst.t WHERE id = 7")
    drainTo("grst.t", out, ckpt)
    val second = spark.read.parquet(out)
      .select("id", "name", "deleted")
      .as[(Long, String, Boolean)].collect().toSet -- first
    assert(second == Set((3L, "a3!", false), (7L, "a7", true)),
      s"v2 UPDATE/DELETE should stream one post-image and one " +
        s"tombstone, got $second")

    // checkpointed restart: nothing new → nothing re-emitted
    drainTo("grst.t", out, ckpt)
    assert(spark.read.parquet(out).count() == 12L)
  }

  test("readStream.table(src) -> writeStream.toTable(dst): standard-API replication") {
    sqlc("""CREATE TABLE grst.src (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    sqlc("""CREATE TABLE grst.dst (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("""INSERT INTO grst.src
        SELECT id, concat('v0-', id), 0L, false FROM range(20)""")
    // an upsert batch and a tombstone, both through plain INSERT
    sqlc("""INSERT INTO grst.src VALUES
        (3, 'v1-3', 1, false), (5, '', 1, true), (20, 'v1-20', 1, false)""")

    val ckpt = tmpDir("grst-rt") + "/ckpt"
    def sync(): Unit = {
      val q = spark.readStream.table("grst.src").writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("grst.dst")
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }
    sync()
    def state(t: String): Set[(Long, String, Long)] =
      sqlc(s"SELECT id, name, version FROM $t")
        .as[(Long, String, Long)].collect().toSet
    assert(state("grst.dst") == state("grst.src"),
      "replica must equal source after the changelog drain")

    // keep writing; the SAME checkpoint catches up incrementally
    sqlc("INSERT INTO grst.src VALUES (0, 'v2-0', 2, false)")
    sqlc("DELETE FROM grst.src WHERE id = 11")
    sync()
    assert(state("grst.dst") == state("grst.src"))
    assert(!state("grst.dst").exists(_._1 == 11L))
  }

  test("feed is opt-in: streaming a plain table fails with the enable hint") {
    sqlc("""CREATE TABLE grst.plain (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO grst.plain VALUES (1, 'x', 0, false)")
    val root = tmpDir("grst-plain")
    val q = spark.readStream.table("grst.plain").writeStream
      .format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[Exception] { q.awaitTermination() }
    assert(err.getMessage.contains("feed") ||
      Option(err.getCause).exists(_.getMessage.contains("feed")),
      s"expected the feed-enable hint, got: ${err.getMessage}")

    // ALTER enables it; the feed starts at the next commit
    sqlc("ALTER TABLE grst.plain SET TBLPROPERTIES ('feed'='true')")
    assert(Compaction.feedEnabled(spark, s"$warehouse/plain"))
    sqlc("INSERT INTO grst.plain VALUES (2, 'y', 0, false)")
    drainTo("grst.plain", s"$root/out2", s"$root/ckpt2")
    val got = spark.read.parquet(s"$root/out2")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L),
      s"post-ALTER commits stream, pre-ALTER history does not: $got")
  }

  test("changelog stream reads pre-evolution feed files under the evolved schema") {
    sqlc("""CREATE TABLE grst.widen (
        id BIGINT, qty INT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    // feed batch 0 carries qty as INT32 under the name 'qty'
    sqlc("""INSERT INTO grst.widen
        SELECT id, CAST(id AS INT), 0L, false FROM range(10)""")
    sqlc("ALTER TABLE grst.widen ALTER COLUMN qty TYPE BIGINT")
    sqlc("ALTER TABLE grst.widen RENAME COLUMN qty TO amount")
    // feed batch 1 carries BIGINT values under the new name
    sqlc("INSERT INTO grst.widen VALUES (3, 9000000000, 1, false)")
    val root = tmpDir("grst-widen")
    drainTo("grst.widen", s"$root/out", s"$root/ckpt")
    val got = spark.read.parquet(s"$root/out")
      .select("id", "amount").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(got(3L) == 9000000000L)
    assert(got(5L) == 5L,
      "pre-evolution feed bytes (old name, INT32) must stream under " +
        "the renamed BIGINT column")
  }

  test("a consumer below the retention horizon fails loudly; fenced/current ones run") {
    sqlc("""CREATE TABLE grst.ret (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4', 'feed'='true')""")
    sqlc("INSERT INTO grst.ret VALUES (1, 'a', 0, false)") // batch 0
    sqlc("INSERT INTO grst.ret VALUES (2, 'b', 1, false)") // batch 1
    val root = tmpDir("grst-ret")
    drainTo("grst.ret", s"$root/out", s"$root/ckpt") // applied 0..1
    Compaction.maintain(spark, s"$warehouse/ret",
      maxFeedAge = java.time.Duration.ZERO) // drops batches 0,1
    sqlc("INSERT INTO grst.ret VALUES (3, 'c', 2, false)") // batch 2
    // the up-to-date checkpoint continues: its next batch (2) is the
    // oldest available
    drainTo("grst.ret", s"$root/out", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/out").count() == 3L)
    // a FRESH consumer demanding all history fails loudly instead of
    // silently skipping the aged-out batches
    val q = spark.readStream.table("grst.ret").writeStream
      .format("parquet").option("path", s"$root/out2")
      .option("checkpointLocation", s"$root/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[Exception] { q.awaitTermination() }
    val all = (err.getMessage +
      Option(err.getCause).map(_.getMessage).getOrElse(""))
    assert(all.contains("retention"),
      s"expected the retention-horizon error, got: $all")
    // a startingBatch fence at the horizon streams what remains
    val q2 = spark.readStream
      .option("startingBatch", "1")
      .table("grst.ret").writeStream
      .format("parquet").option("path", s"$root/out3")
      .option("checkpointLocation", s"$root/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    import spark.implicits._
    assert(spark.read.parquet(s"$root/out3").select("id")
      .as[Long].collect().toSet == Set(3L))
  }

  test("merge-on-read and programmatic merges feed the same stream") {
    val dir = tmpDir("grst-mor") + "/t"
    Compaction.init(
      (0L until 8L).map(i => (i, s"n$i", 0L, false))
        .toDF("id", "name", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", 4, Nil, feed = true)
    // a merge-on-read merge must emit feed events without the caller
    // passing emitFeed (the table flag owns it); init itself emits
    // nothing — the feed describes CHANGES, starting at merge #1
    Compaction.merge(spark,
      dir, Seq((2L, "n2b", 1L, false), (99L, "new", 1L, false))
        .toDF("id", "name", "version", "deleted"),
      mergeOnRead = true)
    val feed = Compaction.readFeed(spark, dir)
    assert(feed.filter($"_change_type" === "update_postimage")
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(feed.filter($"_change_type" === "insert")
      .select("id").as[Long].collect().toSeq == Seq(99L))
  }
}
