package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64

  // deterministic corpus: 100 random vectors + planted near-neighbors
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 100).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    // vec 1000 ≈ vec 0 with small noise; vec 1001 ≈ vec 5
    val near0 = base(0)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val near5 = base(5)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    (base :+ (1000L, near0) :+ (1001L, near5)).toDF("vec_id", "embedding")
  }

  test("brute-force topk: planted neighbor ranks first") {
    val res = Similarity.bruteForceTopK(
      corpus.filter($"vec_id".isin(0L, 5L)), corpus, k = 3)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect()
    val top = res.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert(top(0L) == 1000L)
    assert(top(5L) == 1001L)
  }

  test("lsh topk recovers planted near-neighbors (same bucket ± 1 bit)") {
    val res = Similarity.lshTopK(
      corpus.filter($"vec_id".isin(0L, 5L)), corpus, k = 3, numPlanes = 8)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect()
    val top = res.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    // a 0.01-noise copy flips each hyperplane bit with tiny probability;
    // multi-probe (1-bit flips) makes recovery deterministic-in-practice
    assert(top(0L) == 1000L)
    assert(top(5L) == 1001L)
  }

  test("lsh candidate set is a strict subset of the corpus") {
    val n = Similarity.lshTopK(
      corpus.filter($"vec_id" === 0L), corpus, k = 1000, numPlanes = 8)
      .count()
    assert(n < corpus.count())
  }
}
