package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix filtering must have recall 1: the candidate superset always
  * contains every pair with Jaccard >= num/denom, so the verified
  * output equals the brute-force O(n²) join — on planted near-dups,
  * on pseudo-random docs, and at thresholds where the prefix shrinks
  * to a couple of tokens.
  */
class AllPairsSpec extends SparkSpec {

  import spark.implicits._

  private def jac(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private def brute(docs: Seq[(Long, Set[String])], num: Int,
      denom: Int): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      inter = ta.intersect(tb).size
      uni = ta.union(tb).size
      if inter.toLong * denom >= uni.toLong * num
    } yield (ia, ib)).toSet

  private def run(docs: Seq[(Long, Set[String])], num: Int,
      denom: Int): Set[(Long, Long)] = {
    val df = docs.map { case (id, ts) => (id, ts.toSeq.sorted) }
      .toDF("id", "toks")
    AllPairs.jaccardJoin(df, "id", "toks", num, denom)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private val vocab = (0 until 60).map(i => s"w$i")

  private def randomDocs(n: Int): Seq[(Long, Set[String])] =
    (1 to n).map { i =>
      val ts = vocab.filter(w =>
        (i * 7919 + w.drop(1).toInt * 104729) % 3 != 0).toSet
      (i.toLong, ts)
    }

  test("planted near-dups of different sizes are found exactly") {
    val base = (0 until 20).map(i => s"w$i").toSet
    val docs = Seq(
      1L -> base,
      2L -> (base + "extra"),            // J = 20/21 ~ 0.95
      3L -> (base - "w0"),               // J = 19/20 = 0.95
      4L -> base.map(w => w + "x"),      // disjoint
      5L -> (base -- Seq("w0", "w1", "w2") + "y1" + "y2" + "y3"), // J=17/23
    )
    for ((num, denom) <- Seq((9, 10), (1, 2), (7, 10))) {
      assert(run(docs, num, denom) == brute(docs, num, denom),
        s"tau=$num/$denom")
    }
  }

  test("random corpus: prefix-filtered == brute force at several taus") {
    val docs = randomDocs(60)
    for ((num, denom) <- Seq((9, 10), (4, 5), (3, 5), (1, 2))) {
      assert(run(docs, num, denom) == brute(docs, num, denom),
        s"tau=$num/$denom")
    }
  }

  test("exact duplicates at tau=1 and empty-docs hygiene") {
    val docs = Seq(
      1L -> Set("a", "b", "c"), 2L -> Set("a", "b", "c"),
      3L -> Set("a", "b"), 4L -> Set.empty[String])
    assert(run(docs, 1, 1) == Set((1L, 2L)))
  }

  test("generic over element type: hashed-long features (query space)") {
    val docs = Seq(
      (1L, Seq(11L, 22L, 33L, 44L, 55L, 66L, 77L, 88L, 99L, 110L)),
      (2L, Seq(11L, 22L, 33L, 44L, 55L, 66L, 77L, 88L, 99L, 121L)),
      (3L, Seq(900L, 901L, 902L))).toDF("id", "toks")
    val got = AllPairs.jaccardJoin(docs, "id", "toks", 4, 5)
      .select(col("id_a"), col("id_b"), col("jaccard_bp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 8181L))) // 9/11 = 0.8181...
  }

  test("output carries exact integer sizes and basis points") {
    val docs = Seq(1L -> Set("a", "b", "c", "d"), 2L -> Set("a", "b", "c"))
    val df = docs.map { case (id, ts) => (id, ts.toSeq.sorted) }
      .toDF("id", "toks")
    val row = AllPairs.jaccardJoin(df, "id", "toks", 1, 2).collect()(0)
    assert(row.getAs[Long]("inter") == 3L)
    assert(row.getAs[Long]("n_a") == 4L && row.getAs[Long]("n_b") == 3L)
    assert(row.getAs[Long]("jaccard_bp") == 7500L)
  }
}
