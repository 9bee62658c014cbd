package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time travel on the maintained MERGE table: data files are immutable
  * generations and each manifest version pins the exact directories
  * that held the table then, so readAsOf(v) is "resolve manifest v" —
  * no pre-image renames, no byte copies, ever. Vacuum bounds retention
  * by dropping old manifests and sweeping what they alone referenced.
  */
class TimeTravelSpec extends SparkSpec {

  import spark.implicits._

  private val N_BUCKETS = 8

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet

  private def changeDf(rs: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rs.toDF("id", "payload", "version", "deleted")

  private def initState(n: Int): Seq[(Long, String, Long, Boolean)] =
    (1 to n).map(i => (i.toLong, s"v0-$i", 0L, false))

  test("readAsOf reconstructs every retained version exactly") {
    val dir = tmpDir("tt")
    Compaction.init(changeDf(initState(40)), dir, "id", "version",
      "deleted", nBuckets = N_BUCKETS)
    val s0 = rows(Compaction.read(spark, dir))

    Compaction.merge(spark, dir,
      changeDf(Seq((7L, "v1-7", 1L, false), (41L, "v1-41", 1L, false))),
      retainHistory = true)
    val s1 = rows(Compaction.read(spark, dir))

    Compaction.merge(spark, dir,
      changeDf(Seq((7L, "v2-7", 2L, false), (3L, "", 2L, true))),
      retainHistory = true)
    val s2 = rows(Compaction.read(spark, dir))

    assert(Compaction.versions(spark, dir) == Seq(0L, 1L))
    assert(rows(Compaction.readAsOf(spark, dir, 0L)) == s0)
    assert(rows(Compaction.readAsOf(spark, dir, 1L)) == s1)
    // a version index past the last retained one is the live table
    assert(rows(Compaction.readAsOf(spark, dir, 2L)) == s2)
    assert(s0 != s1 && s1 != s2)
    // spot-check semantics: key 41 exists only from v1 on; 3 dies at v2
    assert(!s0.exists(_._1 == 41L) && s1.exists(_._1 == 41L))
    assert(s1.exists(_._1 == 3L) && !s2.exists(_._1 == 3L))
  }

  test("retained pre-images are the original files, never moved or copied") {
    val dir = tmpDir("tt")
    Compaction.init(changeDf(initState(64)), dir, "id", "version",
      "deleted", nBuckets = N_BUCKETS)
    val s0 = rows(Compaction.read(spark, dir))
    // record pre-merge file identity (absolute path, size, mtime)
    import scala.jdk.CollectionConverters._
    def filesOf(bucketDir: String): Seq[(String, Long, Long)] =
      Files.list(Paths.get(bucketDir)).iterator().asScala
        .filter(f => !f.getFileName.toString.startsWith("."))
        .map(f => (f.toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toSeq.sortBy(_._1)
    val before = Compaction.livePaths(spark, dir)
      .map { case (b, p) => b -> filesOf(p) }

    val stats = Compaction.merge(spark, dir,
      changeDf(Seq((5L, "v1-5", 1L, false))), retainHistory = true)
    assert(stats.touchedBuckets.size == 1)
    val touched = stats.touchedBuckets.head

    val after = Compaction.livePaths(spark, dir)
    def parentDir(file: String) = file.substring(0, file.lastIndexOf('/'))
    // untouched buckets: the manifest still names the ORIGINAL
    // directories and their files are byte-identical in place
    (before.keySet - touched).foreach { b =>
      assert(after(b) == parentDir(before(b).head._1),
        s"untouched bucket $b changed directories")
      assert(filesOf(after(b)) == before(b),
        s"untouched bucket $b was rewritten")
    }
    // the touched bucket points at a NEW generation dir...
    assert(after(touched).contains("/g1-"),
      s"touched bucket should live in generation g1: ${after(touched)}")
    // ...while its v0 pre-image files survive IN PLACE for time travel
    val preImageDir = parentDir(before(touched).head._1)
    assert(filesOf(preImageDir) == before(touched),
      "pre-image files were moved or rewritten (should be immutable)")
    assert(rows(Compaction.readAsOf(spark, dir, 0L)) == s0)
  }

  test("a bucket born after version 0 is absent when reading version 0") {
    val dir = tmpDir("tt")
    // one key -> exactly one occupied bucket
    Compaction.init(changeDf(Seq((1L, "only", 0L, false))), dir,
      "id", "version", "deleted", nBuckets = N_BUCKETS)
    // find a key landing in a DIFFERENT (empty) bucket
    val newKey = (2L to 200L).find { k =>
      spark.range(1).select(
        pmod(xxhash64(lit(k)), lit(N_BUCKETS.toLong)).cast("int"))
        .head().getInt(0) !=
      spark.range(1).select(
        pmod(xxhash64(lit(1L)), lit(N_BUCKETS.toLong)).cast("int"))
        .head().getInt(0)
    }.get
    Compaction.merge(spark, dir,
      changeDf(Seq((newKey, "born-v1", 1L, false))), retainHistory = true)
    val asOf0 = rows(Compaction.readAsOf(spark, dir, 0L))
    assert(asOf0 == Set((1L, "only", 0L)),
      s"newborn bucket leaked into version 0: $asOf0")
    assert(rows(Compaction.read(spark, dir)).map(_._1) == Set(1L, newKey))
  }

  test("vacuum drops old versions and old feed batches") {
    val dir = tmpDir("tt")
    Compaction.init(changeDf(initState(10)), dir, "id", "version",
      "deleted", nBuckets = 4)
    (1 to 3).foreach { i =>
      Compaction.merge(spark, dir,
        changeDf(Seq((i.toLong, s"v$i-$i", i.toLong, false))),
        emitFeed = true, retainHistory = true)
    }
    assert(Compaction.versions(spark, dir) == Seq(0L, 1L, 2L))
    val live = rows(Compaction.read(spark, dir))
    val s2 = rows(Compaction.readAsOf(spark, dir, 2L))
    Compaction.vacuum(spark, dir, keepFromVersion = 2L, feedBefore = 2L)
    assert(Compaction.versions(spark, dir) == Seq(2L))
    // the retained version still reconstructs; live table untouched
    assert(rows(Compaction.readAsOf(spark, dir, 2L)) == s2)
    assert(rows(Compaction.read(spark, dir)) == live)
    assert(Compaction.readFeed(spark, dir)
      .select(col("batch")).distinct()
      .as[Int].collect().toSet == Set(2))
  }
}
