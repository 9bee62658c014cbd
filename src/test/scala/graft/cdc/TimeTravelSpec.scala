package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time travel on the maintained MERGE table: retaining merges move
  * each touched bucket's pre-image into `_history/v=K` by RENAME (no
  * bytes copied), and readAsOf(v) reconstructs the state after v
  * retaining merges from per-bucket nearest-successor pre-images plus
  * the live table. Vacuum bounds retention.
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

  test("history holds exactly the touched buckets, moved not copied") {
    val dir = tmpDir("tt")
    Compaction.init(changeDf(initState(64)), dir, "id", "version",
      "deleted", nBuckets = N_BUCKETS)
    // record pre-merge file identity (name, size, mtime) per bucket
    import scala.jdk.CollectionConverters._
    def listFiles(root: String): Map[String, Seq[(String, Long, Long)]] =
      Files.list(Paths.get(root)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map { b =>
          b.getFileName.toString ->
            Files.list(b).iterator().asScala
              .filter(f => !f.getFileName.toString.startsWith("."))
              .map(f => (f.getFileName.toString, Files.size(f),
                Files.getLastModifiedTime(f).toMillis))
              .toSeq.sortBy(_._1)
        }.toMap
    val before = listFiles(s"$dir/data")

    val stats = Compaction.merge(spark, dir,
      changeDf(Seq((5L, "v1-5", 1L, false))), retainHistory = true)
    assert(stats.touchedBuckets.size == 1)
    val touched = s"bucket=${stats.touchedBuckets.head}"

    val hist = listFiles(s"$dir/_history/v=0")
    assert(hist.keySet == Set(touched),
      s"history should hold only the touched bucket: ${hist.keySet}")
    // rename preserves file identity — same names, sizes, mtimes
    assert(hist(touched) == before(touched),
      "pre-image files were not the originals (copied or rewritten?)")
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
