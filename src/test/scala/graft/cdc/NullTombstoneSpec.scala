package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.GraftCatalog

/** Null-tombstone convention: a NULL delete flag means LIVE, on EVERY
  * read path. Before round 9 the engine folds dropped null-flag
  * winners under three-valued `!col(deleteCol)` while the catalog
  * reader's in-reader fold kept them — so a dirty bucket answered
  * differently through `Compaction.read` vs `SELECT`, and the catalog
  * answer silently changed after compaction. These specs pin the
  * agreement: dirty fold == catalog read == post-compaction read,
  * and Scd2 writes a real `true` (never NULL) into `is_current`.
  */
class NullTombstoneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-nulltomb-wh")
    spark.conf.set("spark.sql.catalog.gnull",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnull.warehouse", w)
    w
  }

  test("null delete flag is LIVE on dirty fold, catalog read, and after compaction") {
    val dir = s"$warehouse/t"
    spark.sql(s"""CREATE TABLE gnull.t (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.sql("""INSERT INTO gnull.t
        SELECT id, concat('base-', id), 0L, false FROM range(20)""")

    // a delta batch with NULL delete flags: an update to a stored key
    // and an insert of a brand-new key — neither is a tombstone
    val delta = Seq(
      (3L, "upd-3", 1L, null.asInstanceOf[java.lang.Boolean]),
      (100L, "new-100", 1L, null.asInstanceOf[java.lang.Boolean]),
      (5L, "gone-5", 1L, java.lang.Boolean.TRUE))
      .toDF("id", "name", "version", "deleted")
    Compaction.merge(spark, dir, delta, mergeOnRead = true)

    def engine(): Set[(Long, String)] =
      Compaction.read(spark, dir).select("id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    def catalog(): Set[(Long, String)] =
      spark.sql("SELECT id, name FROM gnull.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    val dirtyEngine = engine()
    val dirtyCatalog = catalog()
    assert(dirtyEngine.contains((3L, "upd-3")),
      "null-delete update dropped by the engine's dirty fold")
    assert(dirtyEngine.contains((100L, "new-100")),
      "null-delete insert dropped by the engine's dirty fold")
    assert(!dirtyEngine.exists(_._1 == 5L), "true tombstone survived")
    assert(dirtyEngine == dirtyCatalog,
      "dirty-bucket read disagrees between engine fold and catalog scan")

    Compaction.compact(spark, dir)
    assert(engine() == dirtyEngine,
      "answer changed after compaction (engine read)")
    assert(catalog() == dirtyCatalog,
      "answer changed after compaction (catalog read)")
  }

  test("init drops true tombstones but keeps null-flag rows") {
    val dir = tmpDir("nulltomb-init") + "/t"
    val df = Seq(
      (1L, "live", 0L, null.asInstanceOf[java.lang.Boolean]),
      (2L, "dead", 0L, java.lang.Boolean.TRUE),
      (3L, "live2", 0L, java.lang.Boolean.FALSE))
      .toDF("id", "name", "version", "deleted")
    Compaction.init(df, dir, "id", "version", "deleted", 2)
    val ids = Compaction.read(spark, dir).select("id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("Scd2 is_current is a real boolean (never NULL) under null delete flags") {
    val dir = tmpDir("nulltomb-scd2") + "/t"
    val changelog = Seq(
      (1L, "v0", 0L, java.lang.Boolean.FALSE),
      (1L, "v1", 1L, null.asInstanceOf[java.lang.Boolean]),
      (2L, "v0", 0L, null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "name", "version", "deleted")
    Scd2.init(changelog, dir, "id", "version", "deleted", 2)
    val hist = Scd2.read(spark, dir)
    val cur = hist.filter(col("is_current")).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cur == Set((1L, "v1"), (2L, "v0")))
    assert(hist.filter(col("is_current").isNull).count() == 0,
      "is_current carries NULL for null-delete rows")
    // asOf keeps a null-delete current row visible
    val asof = Scd2.asOf(spark, dir, 1L).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(asof == Set((1L, "v1"), (2L, "v0")))
  }
}
