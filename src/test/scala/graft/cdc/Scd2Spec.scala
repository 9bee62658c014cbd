package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintained SCD2 history (graft.cdc.Scd2): incremental merges must
  * equal a from-scratch rebuild over the full changelog — including
  * LATE changes splicing between closed intervals — while rewriting
  * only the buckets containing changed keys. Tombstones close without
  * reopening, replay is idempotent, and asOf time-travels exactly.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val N_BUCKETS = 8

  private def changelog(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("id", "payload", "version", "deleted")

  private def initial(n: Int): Seq[(Long, String, Long, Boolean)] =
    (1L to n).map(i => (i, s"v0-$i", 0L, false))

  private def fresh(n: Int = 100): String = {
    val dir = tmpDir("scd2")
    Scd2.init(changelog(initial(n)), dir, key = "id",
      versionCol = "version", deleteCol = "deleted", nBuckets = N_BUCKETS)
    dir
  }

  private type Row4 = (Long, String, Long, Option[Long], Boolean)

  private def history(dir: String): Set[Row4] =
    Scd2.read(spark, dir)
      .select(col("id"), col("payload"), col("version"),
        col("valid_to"), col("is_current"))
      .as[Row4].collect().toSet

  /** Ground truth: one init over everything. */
  private def rebuild(all: Seq[(Long, String, Long, Boolean)]): Set[Row4] = {
    val dir = tmpDir("scd2-rebuild")
    Scd2.init(changelog(all), dir, key = "id",
      versionCol = "version", deleteCol = "deleted", nBuckets = N_BUCKETS)
    history(dir)
  }

  private def fileState(dir: String): Map[String, Seq[(String, Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    Scd2.livePaths(spark, dir).map { case (bId, p) =>
      val b = Paths.get(p)
      val files = Files.list(b).iterator().asScala
        .filter(f => !f.getFileName.toString.startsWith("."))
        .map(f => (f.toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis)).toSeq.sortBy(_._1)
      s"bucket=$bId" -> files
    }
  }

  test("sequential merges == from-scratch rebuild, incl. late splice") {
    val dir = fresh(50)
    val b1 = Seq((7L, "v2-7", 2L, false), (51L, "v1-51", 1L, false))
    val b2 = Seq(
      (7L, "v1-7-late", 1L, false), // LATE: lands between v0 and v2
      (8L, "v3-8", 3L, false))
    Scd2.merge(spark, dir, changelog(b1))
    Scd2.merge(spark, dir, changelog(b2))
    assert(history(dir) == rebuild(initial(50) ++ b1 ++ b2))
    // the late row closed against the newer version, not the open end
    val intervals = history(dir).filter(_._1 == 7L)
      .map(r => (r._3, r._4)).toList.sortBy(_._1)
    assert(intervals == List((0L, Some(1L)), (1L, Some(2L)), (2L, None)))
  }

  test("replaying a batch is idempotent (at-least-once convergence)") {
    val dir = fresh(30)
    val batch = changelog(Seq((3L, "v1-3", 1L, false), (4L, "", 2L, true)))
    Scd2.merge(spark, dir, batch)
    val once = history(dir)
    Scd2.merge(spark, dir, batch)
    assert(history(dir) == once)
  }

  test("tombstone closes history; later version resurrects the key") {
    val dir = fresh(10)
    Scd2.merge(spark, dir, changelog(Seq((5L, "", 1L, true))))
    val cur = Scd2.current(spark, dir).select("id").as[Long].collect().toSet
    assert(!cur.contains(5L) && cur.contains(4L))
    // the tombstone row itself is in history, closed the predecessor
    assert(history(dir).exists(r => r._1 == 5L && r._3 == 0L && r._4 == Some(1L)))
    Scd2.merge(spark, dir, changelog(Seq((5L, "reborn", 2L, false))))
    val cur2 = Scd2.current(spark, dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(cur2.get(5L).contains("reborn"))
  }

  test("asOf time-travels: state at each version boundary") {
    val dir = fresh(5)
    Scd2.merge(spark, dir, changelog(Seq(
      (1L, "v2-1", 2L, false), (1L, "", 4L, true), (1L, "v6-1", 6L, false))))
    def payloadAt(v: Long): Option[String] =
      Scd2.asOf(spark, dir, v).filter(col("id") === 1L)
        .select("payload").as[String].collect().headOption
    assert(payloadAt(0L).contains("v0-1"))
    assert(payloadAt(1L).contains("v0-1")) // open until the v2 change
    assert(payloadAt(2L).contains("v2-1"))
    assert(payloadAt(4L).isEmpty)          // tombstoned
    assert(payloadAt(5L).isEmpty)
    assert(payloadAt(6L).contains("v6-1"))
  }

  test("manifest stats: zero-scan count stays exact; history watermark prunes from SQL") {
    val dir = fresh(100)
    assert(Scd2.countRows(spark, dir) == 100L)
    val stats = Scd2.merge(spark, dir, changelog(Seq((7L, "v5-7", 5L, false))))
    // history grew by one state row
    assert(Scd2.countRows(spark, dir) == 101L)
    assert(Scd2.countRows(spark, dir) == Scd2.read(spark, dir).count())

    // valid_from zone maps: SQL "history changed since" scans only the
    // merged bucket (MergePruning over the Scd2 manifest)
    graft.plans.MergePruning.ensureRegistered(spark)
    Scd2.read(spark, dir).createOrReplaceTempView("scd2_stats_view")
    val df = spark.sql(
      "SELECT id, payload FROM scd2_stats_view WHERE version > 0")
    assert(df.as[(Long, String)].collect().toSeq == Seq((7L, "v5-7")))
    val opened = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toUri.getPath)
    }.flatten.toSet
    val touchedDirs = stats.touchedBuckets
      .map(Scd2.livePaths(spark, dir)).toSet
    assert(opened.nonEmpty && opened.subsetOf(touchedDirs),
      s"history watermark opened un-pruned dirs: $opened vs $touchedDirs")
  }

  test("point history lookup opens one bucket and returns every interval") {
    val dir = fresh(100)
    Scd2.merge(spark, dir, changelog(Seq((7L, "v1-7", 1L, false))))
    Scd2.merge(spark, dir, changelog(Seq((7L, "", 2L, true))))
    val hist = Scd2.lookup(spark, dir, 7L)
    val rows = hist.select($"payload", $"valid_to", $"is_current")
      .as[(String, Option[Long], Boolean)].collect().toSet
    assert(rows == Set(("v0-7", Some(1L), false),
      ("v1-7", Some(2L), false), ("", None, false)),
      s"full history incl. the tombstone must come back: $rows")
    val dirs = hist.inputFiles.map(f => { val p = new java.net.URI(f).getPath
      p.substring(0, p.lastIndexOf('/')) }).distinct
    assert(dirs.length == 1, s"history lookup must open one bucket: $dirs")
    assert(Scd2.lookup(spark, dir, 9999L).count() == 0L)
  }

  test("rebucket preserves history, counts, and current-state reads") {
    val dir = fresh(60)
    Scd2.merge(spark, dir, changelog(Seq((7L, "v1-7", 1L, false))))
    val before = history(dir)
    Scd2.rebucket(spark, dir, 16)
    val (_, _, _, nB) = Scd2.readMeta(spark, dir)
    assert(nB == 16)
    assert(history(dir) == before, "rebucket must not change history")
    assert(Scd2.countRows(spark, dir) == 61L)
    val current = Scd2.current(spark, dir)
      .filter($"id" === 7L).select($"payload").as[String].collect()
    assert(current.toSeq == Seq("v1-7"))
    // further merges work under the new layout
    Scd2.merge(spark, dir, changelog(Seq((8L, "v2-8", 2L, false))))
    assert(Scd2.countRows(spark, dir) == 62L)
  }

  test("merge batch carrying generated columns fails fast (no silent clobber)") {
    val dir = fresh(10)
    val bad = Seq((1L, "x", 9L, false, true))
      .toDF("id", "payload", "version", "deleted", "is_current")
    intercept[IllegalArgumentException] { Scd2.merge(spark, dir, bad) }
    val bad2 = Seq((1L, "x", 9L, false, 7))
      .toDF("id", "payload", "version", "deleted", "bucket")
    intercept[IllegalArgumentException] { Scd2.merge(spark, dir, bad2) }
    // and the refusals left the table untouched
    assert(Scd2.read(spark, dir).count() == 10L)
  }

  test("untouched buckets are byte-identical; scan prunes to touched") {
    val dir = fresh(200)
    val before = fileState(dir)
    assert(before.size == N_BUCKETS)
    val stats = Scd2.merge(spark, dir,
      changelog(Seq((42L, "v1-42", 1L, false))))
    assert(stats.touchedBuckets.size == 1)
    val touched = stats.touchedBuckets.map(b => s"bucket=$b").toSet
    val after = fileState(dir)
    (before.keySet -- touched).foreach { b =>
      assert(after(b) == before(b), s"untouched $b was rewritten")
    }
    touched.foreach(b => assert(after(b) != before(b)))
    // pruned read: the merge-path scan opens only touched buckets' files
    val files = Scd2.prunedHistory(spark, dir, stats.touchedBuckets).inputFiles
    assert(files.nonEmpty)
    val touchedDirs = stats.touchedBuckets.map(b => s"/bucket=$b/").toSet
    assert(files.forall(f => touchedDirs.exists(f.contains)),
      s"scan read beyond touched buckets: ${files.mkString(", ")}")
  }
}
