package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error bounds for the sketch aggregates behind agg_sketches (the
  * query stays rows-only — estimates are engine-specific — so the
  * exactness contract lives here): HLL++ cardinality within its rsd,
  * approximate percentiles within the accuracy-implied rank error.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("approx_count_distinct lands within the requested rsd") {
    // distinct cardinalities across two orders of magnitude
    Seq(100L, 5000L, 50000L).foreach { n =>
      val df = spark.range(0, n * 3).select(($"id" % n).as("v"))
      val est = df.agg(approx_count_distinct($"v", rsd = 0.02))
        .collect().head.getLong(0)
      // 5 sigma of the configured 2% relative standard deviation
      assert(math.abs(est - n).toDouble / n <= 0.10,
        s"n=$n est=$est")
    }
  }

  test("percentile_approx honors its rank-accuracy contract") {
    val n = 20000
    val df = spark.range(0, n).select($"id".cast("double").as("v"))
    val accuracy = 1000 // max rank error = n / accuracy = 20 ranks
    val est = df.agg(percentile_approx($"v", lit(0.5), lit(accuracy)))
      .collect().head.getDouble(0)
    val exactRank = 0.5 * (n - 1)
    assert(math.abs(est - exactRank) <= n.toDouble / accuracy + 1,
      s"median est=$est exact~$exactRank")
  }

  test("hll sketches are mergeable: split-and-union equals one pass") {
    val df = spark.range(0, 30000).select(($"id" % 7000).as("v"))
    val whole = df.agg(approx_count_distinct($"v", rsd = 0.02))
      .collect().head.getLong(0)
    // same aggregate over an explicitly re-partitioned input — the
    // partial sketches merge across a different partitioning and must
    // produce the identical estimate (HLL merge is deterministic)
    val repart = df.repartition(17, $"v")
      .agg(approx_count_distinct($"v", rsd = 0.02))
      .collect().head.getLong(0)
    assert(whole == repart)
  }
}
