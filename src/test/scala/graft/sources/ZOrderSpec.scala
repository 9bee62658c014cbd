package graft.sources

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton interleave correctness against a reference implementation,
  * and the layout property that justifies it: z-ordered files carry
  * tight bounding boxes in BOTH dimensions, so parquet min/max stats
  * prune on either column — a single-column sort only prunes its
  * leading column.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def refMorton(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var r = v & 0xffffffffL
      r = (r | (r << 16)) & 0x0000ffff0000ffffL
      r = (r | (r << 8)) & 0x00ff00ff00ff00ffL
      r = (r | (r << 4)) & 0x0f0f0f0f0f0f0f0fL
      r = (r | (r << 2)) & 0x3333333333333333L
      r = (r | (r << 1)) & 0x5555555555555555L
      r
    }
    spread(x) | (spread(y) << 1)
  }

  test("mortonCode matches the reference bit interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (255L, 1L), (0xffffffffL, 0xffffffffL), (12345L, 67890L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.mortonCode($"x", $"y").as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => refMorton(x, y) })
    // spot-pin the canonical small values: (x=3, y=5) -> 100111b
    assert(refMorton(3, 5) == 39L)
  }

  test("z-ordered files bound both dimensions tightly") {
    val dir = tmpDir("zorder")
    // 64x64 grid, shuffled-ish arrival order
    val grid = spark.range(0, 4096)
      .select((($"id" * 2654435761L) % 4096).as("k"))
      .select(($"k" % 64).as("x"), ($"k" / 64).cast("long").as("y"))

    ZOrder.writeZOrdered(grid, s"$dir/z", "x", "y", numFiles = 16)
    // comparison layout: same file count, sorted by x only
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // the pruning-relevant stat: how much of the NON-leading dimension
    // each file spans — a predicate on y skips files whose y-range
    // misses it. (Bbox AREAS tie here: 4×64 x-slices = 16×16 z-tiles.)
    def maxYExtent(path: String): Long = {
      val files = new File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length > 1)
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("y"), max("y")).collect().head
        r.getLong(1) - r.getLong(0) + 1
      }.max
    }

    val zY = maxYExtent(s"$dir/z")
    val linY = maxYExtent(s"$dir/linear")
    // 16 z-files over a 64x64 grid ≈ 16x16 curve tiles (allow slack
    // for range-partition boundaries); x-sorted files span ALL of y,
    // so y-predicates can never skip any of them
    assert(zY <= 32, s"z max y-extent $zY")
    assert(linY == 64, s"linear max y-extent $linY")
  }
}
