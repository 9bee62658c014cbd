package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The compaction contract: small files merge, everything else is
  * untouched byte-for-byte, and readers can't tell the difference.
  */
class OptimizeSpec extends SparkSpec {

  import spark.implicits._

  private def fileMap(dir: String): Map[String, (Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && n.endsWith(".parquet"))
        b += f.getPath.toString -> ((f.getLen, f.getModificationTime))
    }
    b.result()
  }

  test("planBins: first-fit-decreasing, deterministic, target-bounded") {
    val files = Seq(("a", 60L), ("b", 40L), ("c", 30L), ("d", 30L), ("e", 200L))
    val bins = Optimize.planBins(files, targetBytes = 100L)
    // every bin but oversize singletons fits the target
    bins.foreach { bin =>
      assert(bin.map(_._2).sum <= 100L || bin.size == 1)
    }
    // all files placed exactly once
    assert(bins.flatten.map(_._1).sorted == files.map(_._1).sorted)
    // deterministic for a shuffled input
    assert(Optimize.planBins(files.reverse, 100L) == bins)
  }

  test("compacts small files, preserves rows, never touches big files") {
    val dir = tmpDir("optimize")
    // one big file...
    (0 until 50000).map(i => (i.toLong, s"payload-$i"))
      .toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    // ...plus six tiny appended files (a streaming sink's debris)
    (0 until 6).foreach { b =>
      Seq((100000L + b, s"tiny-$b")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = fileMap(dir)
    val beforeRows = spark.read.parquet(dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val big = before.filter(_._2._1 >= 10000L).keys.toSet
    assert(big.nonEmpty && before.size == 7)

    val stats = Optimize.compact(spark, dir,
      targetBytes = 1 << 20, smallBytes = 10000L)

    assert(stats.filesCompacted == 6 && stats.filesWritten == 1, stats)
    val after = fileMap(dir)
    // big files: same path, same length, same modification time
    big.foreach { f =>
      assert(after.contains(f) && after(f) == before(f),
        s"big file disturbed: $f")
    }
    // the six tiny files are gone, one compacted file replaces them
    assert(after.size == big.size + 1, after.keys.toSeq.sorted)
    // readers see identical content
    val afterRows = spark.read.parquet(dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(afterRows == beforeRows)
  }

  test("churn guards: lone small file and big-only dirs are no-ops") {
    val dir = tmpDir("optimize-noop")
    (0 until 50000).map(i => (i.toLong, s"payload-$i"))
      .toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    Seq((1L, "only-one-tiny")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val before = fileMap(dir)
    val stats = Optimize.compact(spark, dir,
      targetBytes = 1 << 20, smallBytes = 10000L)
    assert(stats.filesCompacted == 0 && stats.filesWritten == 0, stats)
    assert(fileMap(dir) == before)
  }

  test("partitioned layout: packing stays inside each partition dir") {
    val dir = tmpDir("optimize-part")
    (0 until 2).foreach { part =>
      (0 until 3).foreach { b =>
        Seq((part * 10L + b, s"p$part-$b")).toDF("id", "s")
          .coalesce(1).write.mode("append").parquet(s"$dir/part=$part")
      }
    }
    val beforeRows = spark.read.parquet(s"$dir/part=0").count() +
      spark.read.parquet(s"$dir/part=1").count()
    val stats = Optimize.compact(spark, dir,
      targetBytes = 1 << 20, smallBytes = 10000L)
    // three tiny files per partition -> one file per partition
    assert(stats.filesCompacted == 6 && stats.filesWritten == 2, stats)
    (0 to 1).foreach { p =>
      assert(fileMap(s"$dir/part=$p").size == 1)
    }
    assert(spark.read.parquet(s"$dir/part=0").count() +
      spark.read.parquet(s"$dir/part=1").count() == beforeRows)
  }
}
