package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer PageRank (graft.operators.PageRank): structural sanity on a
  * star graph, near-conservation of the integer mass, and the property
  * the design exists for — bit-identical ranks regardless of
  * partitioning (an associative integer inbox sum cannot vary with
  * shuffle order, where a float sum can).
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private val MASS = 1000000000000L

  // hub 0 ↔ leaves 1..10, symmetrized
  private def star = {
    val e = (1L to 10L).flatMap(i => Seq((0L, i), (i, 0L)))
    e.toDF("src", "dst")
  }

  test("hub of a star outranks its leaves; leaves tie exactly") {
    val r = PageRank.ranks(star, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val leaves = (1L to 10L).map(r)
    assert(r(0L) > leaves.max)
    assert(leaves.distinct.size === 1)
  }

  test("integer mass is conserved up to truncation leakage") {
    val total = PageRank.ranks(star, iterations = 3)
      .agg(sum(col("rank_scaled"))).as[Long].head()
    assert(total <= MASS)
    assert(total > MASS - MASS / 100) // leakage < 1%
  }

  test("ranks are bit-identical across partitionings") {
    val a = PageRank.ranks(star.repartition(1), iterations = 2)
      .orderBy(col("node")).as[(Long, Long)].collect()
    val b = PageRank.ranks(star.repartition(13), iterations = 2)
      .orderBy(col("node")).as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }
}
