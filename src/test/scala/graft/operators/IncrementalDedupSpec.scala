package graft.operators

import graft.SparkSpec

/** Incremental near-dedup against a persisted LSH index: new batches
  * are checked against the indexed corpus (and themselves) without
  * recomputing the old corpus's signatures, and the found pairs match
  * a from-scratch run over the union.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val oldCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely different content about spark query planning"),
    (3L, "a third document with its own unrelated vocabulary set"),
  ).toDF("doc_id", "text")

  private val newBatch = Seq(
    // word-shuffled near-copy of indexed doc 1 (unigram jaccard 1.0)
    (101L, "lazy dog tonight the quick brown fox jumps over the"),
    // two near-identical docs within the new batch
    (102L, "fresh ingest rows arriving with almost identical payloads here"),
    (103L, "fresh ingest rows arriving with almost identical payloads there"),
    (104L, "and one genuinely novel document matching nothing else"),
  ).toDF("doc_id", "text")

  test("finds cross-index and within-batch pairs without old recompute") {
    val dir = tmpDir("lshidx")
    Dedup.writeLshIndex(oldCorpus, "doc_id", "text", dir, ngram = 1)
    // signature params come from the index's own metadata
    val pairs = Dedup.dedupAgainstIndex(newBatch, "doc_id", "text", dir,
      threshold = 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L), (102L, 103L)))
  }

  test("incremental pairs equal a from-scratch run on the union") {
    val dir = tmpDir("lshidx2")
    Dedup.writeLshIndex(oldCorpus, "doc_id", "text", dir, ngram = 1)
    val incremental = Dedup
      .dedupAgainstIndex(newBatch, "doc_id", "text", dir,
        threshold = 0.7)
      .select("id_a", "id_b").collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    val scratch = Dedup
      .minhashNearDups(oldCorpus.unionByName(newBatch), "doc_id", "text",
        threshold = 0.7, ngram = 1)
      .select("id_a", "id_b").collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    // old-old pairs would be known already; this corpus has none, so
    // the incremental view IS the full pair set
    assert(incremental == scratch)
  }

  test("curateIncremental drops index-dups and batch-dups, keeps novel") {
    val dir = tmpDir("lshidx3")
    Dedup.writeLshIndex(oldCorpus, "doc_id", "text", dir, ngram = 1)
    val out = Curation.curateIncremental(newBatch, dir,
      Curation.Config(keepLangs = Set.empty, minTokens = 1,
        nearDupThreshold = 0.7, nearDupNgram = 1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 101 dups the indexed doc 1; 103 dups earlier batch row 102;
    // 102 survives as its pair's first row; 104 is novel
    assert(out == Set(102L, 104L))
  }
}
