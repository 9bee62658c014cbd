package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The giant-basket guard (r4 verdict item): one degenerate basket —
  * 10k items in a single order — must NOT quadratically explode into
  * ~50M pairs inside one task. Baskets above the cap are dropped
  * before the pair explode in both basket_pairs and item_similarity,
  * so the output stays bounded by the HEALTHY baskets and the planted
  * monster contributes nothing.
  */
class BasketCapSpec extends SparkSpec {

  import spark.implicits._

  private def plantedDir(): String = {
    val dir = tmpDir("basketcap")
    // 50 healthy baskets of 4 items each over a small co-occurring
    // catalog, plus one pathological 10k-item basket
    val healthy = (1L to 50L).flatMap(o =>
      (0L until 4L).map(i => (o, 100L + (o + i) % 8)))
    val giant = (1L to 10000L).map(p => (9999L, 10000L + p))
    (healthy ++ giant).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("basket_pairs drops the giant basket before the explode") {
    val dir = plantedDir()
    val out = graft.SparkEntry.queries("basket_pairs")(spark, dir).collect()
    assert(out.nonEmpty, "healthy baskets should still produce pairs")
    // nothing from the giant basket's part-id range survives, and the
    // result is bounded by the healthy catalog (8 parts -> <= 28 pairs)
    assert(out.forall(r => r.getLong(0) < 10000L && r.getLong(1) < 10000L),
      "giant-basket pairs leaked into the result")
    assert(out.length <= 28)
  }

  test("item_similarity drops the giant basket before the explode") {
    val dir = plantedDir()
    val out = graft.SparkEntry.queries("item_similarity")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) < 10000L && r.getLong(1) < 10000L),
      "giant-basket pairs leaked into the result")
  }
}
