package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  // corpus with two planted near-dup clusters and unrelated docs
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // ~dup of 1
    (3L, "spark executes distributed dataframes with catalyst optimizing every logical plan"),
    (4L, "spark executes distributed dataframes with catalyst optimizing every physical plan"), // ~dup of 3
    (5L, "completely unrelated text about cooking pasta with tomato sauce and basil leaves"),
    (6L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash LSH (unigram space) finds planted near-dup pairs and no unrelated ones") {
    // token-edit near-dups live in bag-of-words space: one changed
    // token barely moves word-Jaccard
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.7, ngram = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(pairs.contains((1L, 6L)))
    assert(pairs.contains((2L, 6L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("minhash LSH (shingle space) scores order-sensitively: edge edit high, middle edit low") {
    // trailing-token edit (1,2) keeps most 3-shingles; a mid-document
    // edit (3,4) destroys 3 of 8 — the order-sensitivity that separates
    // shingle space from bag-of-words
    val j = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.0, ngram = 3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 6L)) == 1.0) // exact dup
    assert(j((1L, 2L)) > 0.7)
    // the mid-document edit destroys strictly more shingles than the
    // trailing edit — and lands well under its unigram score (9/11)
    assert(j.getOrElse((3L, 4L), 0.0) < j((1L, 2L)))
    assert(j.getOrElse((3L, 4L), 0.0) <= 0.6)
  }

  test("minhash dedup keeps lowest-id survivor per cluster") {
    val survivors = Dedup.minhashDedup(docs, "doc_id", "text",
        threshold = 0.7, ngram = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 5L))
  }

  test("identical texts have identical minhash signatures") {
    val sigs = docs.filter(col("doc_id").isin(1L, 6L))
      .select(Dedup.minhashSignature(col("text")).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("connected components: transitive chains collapse to one cluster") {
    // chain 1-2, 2-3 (transitive), separate pair 10-11, isolated via self
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    // driver union-find path (small graph)...
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    // ...and the distributed propagation path must agree exactly
    val dist = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == cc)
  }

  test("cluster dedup keeps one survivor per transitive component") {
    // 1~2, 2~6 similar; 1 vs 6 identical (transitive closure via 2)
    val survivors = Dedup.minhashDedupClusters(docs, "doc_id", "text",
      threshold = 0.7, ngram = 1).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 5L))
  }

  test("simhash: identical fp for exact dups, close for near-dups, far for unrelated") {
    val fps = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(6L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) <= 8)
    assert(ham(fps(3L), fps(4L)) <= 8)
    assert(ham(fps(1L), fps(5L)) > 8)
  }

  test("native minhash expression matches the declarative form exactly") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (ngram <- Seq(1, 3)) {
      val diff = corpus
        .withColumn("xs", Dedup.featureHashesModP(col("text"), ngram))
        .select(
          graft.functions.MinHashExpr.minhash(col("xs")).as("native"),
          Dedup.minhashFromHashes(col("xs")).as("declarative"))
        .filter(!(col("native") <=> col("declarative")))
        .count()
      assert(diff == 0, s"ngram=$ngram signatures diverge")
    }
  }

  test("native simhash64 expression matches the declarative fold exactly") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = corpus
      .withColumn("th", Dedup.tokenHashes(col("text")))
      .select(
        graft.functions.SimHashExpr.simhash64(col("th")).as("native"),
        Dedup.simhashFromHashes(col("th")).as("declarative"))
      .filter(col("native") =!= col("declarative"))
      .count()
    assert(diff == 0)
  }

  test("simhash banding finds pairs within maxBits hamming") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 6L))) // hamming 0 — always found
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }
}
