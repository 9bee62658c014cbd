package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** History retention on SCD2 tables ([[Scd2.expireHistoryBefore]]):
  * superseded-before-the-cut rows retire, the covering suffix of each
  * key's chain survives byte-for-byte, asOf refuses below the
  * committed floor, the floor is monotone and survives later merges.
  */
class Scd2ExpireSpec extends SparkSpec {

  import spark.implicits._

  private def changelog(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("id", "payload", "version", "deleted")

  /** 40 keys × versions 0..3; keys %5 == 0 tombstoned at v1 and never
    * resurrected (dead before the cut), keys %7 == 0 tombstoned at v3
    * (dead after it).
    */
  private def build(): (String, Seq[(Long, String, Long, Boolean)]) = {
    val dir = tmpDir("scd2-expire")
    val v0 = (1L to 40L).map(i => (i, s"v0-$i", 0L, false))
    val v1 = (1L to 40L).map(i => (i, s"v1-$i", 1L, i % 5 == 0))
    val v2 = (1L to 40L).filter(_ % 5 != 0)
      .map(i => (i, s"v2-$i", 2L, false))
    val v3 = (1L to 40L).filter(i => i % 5 != 0 && i % 2 == 0)
      .map(i => (i, s"v3-$i", 3L, i % 7 == 0))
    Scd2.init(changelog(v0), dir, key = "id",
      versionCol = "version", deleteCol = "deleted", nBuckets = 8)
    Scd2.merge(spark, dir, changelog(v1))
    Scd2.merge(spark, dir, changelog(v2))
    Scd2.merge(spark, dir, changelog(v3))
    (dir, v0 ++ v1 ++ v2 ++ v3)
  }

  private def stateOf(df: DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("payload")).as[(Long, String)].collect().toSet

  test("expire keeps current state and every asOf at/after the cut") {
    val (dir, _) = build()
    val curBefore = stateOf(Scd2.current(spark, dir))
    val asOf2Before = stateOf(Scd2.asOf(spark, dir, 2L))
    val asOf3Before = stateOf(Scd2.asOf(spark, dir, 3L))
    val rowsBefore = Scd2.countRows(spark, dir)

    val dropped = Scd2.expireHistoryBefore(spark, dir, 2L)
    assert(dropped > 0)
    assert(Scd2.countRows(spark, dir) == rowsBefore - dropped)

    assert(stateOf(Scd2.current(spark, dir)) == curBefore)
    assert(stateOf(Scd2.asOf(spark, dir, 2L)) == asOf2Before)
    assert(stateOf(Scd2.asOf(spark, dir, 3L)) == asOf3Before)

    val hist = Scd2.read(spark, dir)
    // no surviving row was superseded at/before the cut
    assert(hist.filter(col("valid_to").isNotNull &&
      col("valid_to") <= 2L).count() == 0)
    // dead-before-cut keys (%5, tombstoned at v1) erased entirely
    assert(hist.filter(col("id") % 5 === 0).count() == 0)
    // dead-after-cut tombstones (v3) remain as history
    assert(hist.filter(col("deleted") && col("version") === 3L)
      .count() > 0)
    // asOf below the floor refuses loudly
    val e = intercept[IllegalArgumentException] {
      Scd2.asOf(spark, dir, 1L).count()
    }
    assert(e.getMessage.contains("expired-history floor"))
  }

  test("the floor is monotone and a below-floor re-run is a no-op") {
    val (dir, _) = build()
    assert(Scd2.expireHistoryBefore(spark, dir, 2L) > 0)
    val v = TxLog.latestVersion(spark, dir).get
    assert(Scd2.expireHistoryBefore(spark, dir, 1L) == 0L)
    assert(Scd2.expireHistoryBefore(spark, dir, 2L) == 0L)
    // no-ops committed nothing
    assert(TxLog.latestVersion(spark, dir).get == v)
  }

  test("a cut below all history commits only the floor, dirs untouched") {
    val (dir, _) = build()
    val dirsBefore = Scd2.livePaths(spark, dir)
    assert(Scd2.expireHistoryBefore(spark, dir, -5L) == 0L)
    assert(Scd2.livePaths(spark, dir) == dirsBefore)
    // the floor still fences
    intercept[IllegalArgumentException] {
      Scd2.asOf(spark, dir, -10L).count()
    }
    // but at/above it everything answers
    assert(stateOf(Scd2.asOf(spark, dir, 0L)).nonEmpty)
  }

  test("EXPIRE HISTORY SQL verb resolves catalog scd2 tables; merge tables refuse") {
    val (dir, _) = build()
    val w = tmpDir("scd2-expire-wh")
    spark.conf.set("spark.sql.catalog.xcat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xcat.warehouse", w)
    // attach the existing history by LOCATION (type-checked by CREATE)
    spark.sql(s"""CREATE TABLE xcat.hist (
        id BIGINT, payload STRING, version BIGINT, deleted BOOLEAN)
        USING scd2 TBLPROPERTIES ('keys'='id') LOCATION '$dir'""")
    val cur = stateOf(Scd2.current(spark, dir))
    val out = graft.plans.GraftTables.sql(spark,
      "EXPIRE HISTORY xcat.hist BEFORE 2")
      .collect().head
    assert(out.getString(0) == "xcat.hist" && out.getLong(1) > 0)
    assert(stateOf(Scd2.current(spark, dir)) == cur)
    intercept[IllegalArgumentException] {
      Scd2.asOf(spark, dir, 1L).count()
    }
    // a merge table refuses loudly instead of misapplying scd2 rules
    spark.sql("""CREATE TABLE xcat.m (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    val e = intercept[Exception] {
      graft.plans.GraftTables.sql(spark,
        "EXPIRE HISTORY xcat.m BEFORE 2")
    }
    assert(e.getMessage.contains("EXPIRE"), e.getMessage)
  }

  test("expire folds merge-on-read deltas and the floor survives merges") {
    val (dir, _) = build()
    Scd2.merge(spark, dir,
      changelog((1L to 40L).filter(_ % 5 != 0)
        .map(i => (i, s"v4-$i", 4L, false))),
      mergeOnRead = true)
    assert(Scd2.deltaStats(spark, dir).nonEmpty)
    val cur = stateOf(Scd2.current(spark, dir))
    assert(Scd2.expireHistoryBefore(spark, dir, 3L) > 0)
    // candidates folded: every delta chain was in a candidate bucket
    assert(Scd2.deltaStats(spark, dir).isEmpty)
    assert(stateOf(Scd2.current(spark, dir)) == cur)
    // a later merge carries the committed floor forward
    Scd2.merge(spark, dir,
      changelog(Seq((2L, "v5-2", 5L, false))))
    val e = intercept[IllegalArgumentException] {
      Scd2.asOf(spark, dir, 2L).count()
    }
    assert(e.getMessage.contains("expired-history floor"))
    assert(stateOf(Scd2.asOf(spark, dir, 5L)).exists(_._2 == "v5-2"))
  }

  test("a replayed pre-floor batch cannot resurrect below-floor " +
      "history (merge-side fence, r12)") {
    val (dir, _) = build()
    assert(Scd2.expireHistoryBefore(spark, dir, 2L) > 0)
    val cur = stateOf(Scd2.current(spark, dir))
    val asOfFloor = stateOf(Scd2.asOf(spark, dir, 2L))
    val rows = Scd2.countRows(spark, dir)
    // replay the ANCIENT v0/v1 batches: every row is either fully
    // superseded before the floor or a below-floor tombstone — all
    // were retired by expire and must die at the merge fence
    Scd2.merge(spark, dir, changelog(
      (1L to 40L).map(i => (i, s"v0-$i", 0L, false)) ++
        (1L to 40L).map(i => (i, s"v1-$i", 1L, i % 5 == 0))))
    assert(stateOf(Scd2.current(spark, dir)) == cur)
    assert(stateOf(Scd2.asOf(spark, dir, 2L)) == asOfFloor)
    assert(Scd2.countRows(spark, dir) == rows,
      "replayed pre-floor rows must not land on disk")
    // no below-floor row anywhere in the stored history
    val hist = Scd2.read(spark, dir)
    assert(hist.filter(col("valid_to").isNotNull &&
      col("valid_to") <= 2L).count() == 0)
    assert(hist.filter(col("deleted") && col("version") <= 2L)
      .count() == 0)
    // a LEGITIMATE late row whose successor sits above the floor
    // still splices in, exactly as expire would have kept it: key 3
    // survives at v2 with no v1 row (expired) — a replayed v1 row for
    // key 3 was superseded at v2 <= ... v2 > floor? valid_to=2 <= 2
    // so it dies; a v1.5-style row closing at v2 dies the same way.
    // A late row closing ABOVE the floor: key 2 history has v2, v3;
    // splice a fresh version 2.5-analog (v=2, already there) — use a
    // NEW key instead: first-seen key 99 at v1 would close nowhere
    // (current), so it must SURVIVE the fence (it is not below-floor
    // history, it is live state expire never touches)
    Scd2.merge(spark, dir, changelog(Seq((99L, "v1-99", 1L, false))))
    assert(stateOf(Scd2.current(spark, dir)).contains((99L, "v1-99")),
      "a first-seen key below the floor is live state, not retired " +
        "history — the fence must keep it")
  }

  test("merge-on-read replay of retired history stays invisible to " +
      "reads and compact scrubs it (r12)") {
    val (dir, _) = build()
    assert(Scd2.expireHistoryBefore(spark, dir, 2L) > 0)
    val cur = stateOf(Scd2.current(spark, dir))
    val hist = Scd2.read(spark, dir).count()
    // replay retired rows as a MoR delta: the fold must re-apply the
    // expire predicate, so reads never show them
    Scd2.merge(spark, dir, changelog(
      (1L to 40L).map(i => (i, s"v1-$i", 1L, i % 5 == 0))),
      mergeOnRead = true)
    assert(Scd2.deltaStats(spark, dir).nonEmpty)
    assert(stateOf(Scd2.current(spark, dir)) == cur)
    assert(Scd2.read(spark, dir).count() == hist,
      "folded read must not resurrect retired history")
    assert(Scd2.read(spark, dir).filter(col("valid_to").isNotNull &&
      col("valid_to") <= 2L).count() == 0)
    // compact materializes the fold: disk is clean afterwards
    Scd2.compact(spark, dir)
    assert(Scd2.deltaStats(spark, dir).isEmpty)
    assert(Scd2.read(spark, dir).count() == hist)
    assert(stateOf(Scd2.current(spark, dir)) == cur)
  }
}
