package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic partial-aggregate maintenance: merged per-batch partials
  * must equal a full recompute, under any batch split and merge order.
  */
class IncrementalStatsSpec extends SparkSpec {

  import spark.implicits._

  private def data = (1 to 300).map(i =>
    (s"k${i % 4}", (i * 7919) % 1000)).toDF("k", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(_.toSeq).toSeq

  test("merged batch partials equal the one-shot recompute") {
    val full = IncrementalStats.partials(data, "k", "v")
    val merged = IncrementalStats.merge(
      IncrementalStats.partials(data.filter($"v" < 250), "k", "v"),
      IncrementalStats.partials(data.filter($"v" >= 250 && $"v" < 700), "k", "v"),
      IncrementalStats.partials(data.filter($"v" >= 700), "k", "v"))
    assert(rows(merged) == rows(full))
    // finalize derives identical means/variances from identical state
    assert(rows(IncrementalStats.finalize(merged)) ==
      rows(IncrementalStats.finalize(full)))
  }

  test("merge is order-insensitive and re-mergeable") {
    val a = IncrementalStats.partials(data.filter($"v" % 2 === 0), "k", "v")
    val b = IncrementalStats.partials(data.filter($"v" % 2 === 1), "k", "v")
    val ab = IncrementalStats.merge(a, b)
    val ba = IncrementalStats.merge(b, a)
    assert(rows(ab) == rows(ba))
    // merging a merged state with an empty increment is a no-op
    val empty = IncrementalStats.partials(data.filter(lit(false)), "k", "v")
    assert(rows(IncrementalStats.merge(ab, empty)) == rows(ab))
  }
}
