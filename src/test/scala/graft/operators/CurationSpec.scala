package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("curation pipeline: filters, exact-dedups, near-dedups, appends stats") {
    val docs = Seq(
      // survives everything
      (1L, "the quick brown fox jumps over the lazy dog near a river bank"),
      // exact dup of 1 (dropped at stage 3)
      (2L, "the quick brown fox jumps over the lazy dog near a river bank"),
      // near dup of 1 (dropped at stage 4)
      (3L, "the quick brown fox jumps over the lazy dog near a river tonight"),
      // too short (dropped at quality gate)
      (4L, "too short"),
      // no stopword-set hits -> fails min stop ratio when configured
      (5L, "colorless green ideas sleep furiously without common words here today"),
    ).toDF("doc_id", "text")

    val cfg = Curation.Config(
      keepLangs = Set.empty, // synthetic text: skip lang filter
      minTokens = 5,
      minStopRatio = 0.05,
      nearDupThreshold = 0.7)
    val out = Curation.curate(docs, cfg)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))

    val row = out.head()
    assert(row.getAs[Int]("n_tokens") == 13)
    assert(row.getAs[Int]("n_chars") > 0)
  }

  test("near-dup threshold dial: loosening keeps the near-dup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (3L, "completely different content about cooking pasta with tomato sauce today"),
    ).toDF("doc_id", "text")
    val out = Curation.curate(docs,
      Curation.Config(keepLangs = Set.empty, minTokens = 5))
    assert(out.count() == 2) // unrelated docs both survive
  }

  test("model gate composes into the funnel with its own observed " +
      "counter (r12)") {
    val docs = Seq(
      // high stopword ratio + punctuation → positive logit
      (1L, "the quick brown fox jumps over the lazy dog, and it was " +
        "a very good day for all of them."),
      // word salad: no stopwords, no punctuation → negative logit
      (2L, "colorless green ideas sleep furiously quantum blockchain " +
        "synergy paradigm leverage disrupt ideate pivot"),
      // exact dup of 1 (must die at exact dedup, AFTER the model gate)
      (3L, "the quick brown fox jumps over the lazy dog, and it was " +
        "a very good day for all of them."),
      // distinct survivor (keeps the cluster stage non-degenerate)
      (4L, "a completely different account of the history of steam " +
        "engines in europe, and how they were built."),
    ).toDF("doc_id", "text")
    val model = QualityModel.Model(
      bias = -2.5, weights = Seq(2.0, 8.0, 10.0, 1.0))
    val cfg = Curation.Config(keepLangs = Set.empty, minTokens = 5,
      modelGate = Some((model, 0.0)))
    // the docs straddle the threshold — pin it before composing
    val logits = docs.select(col("doc_id"),
      QualityModel.score(model)(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(logits(1L) > 0.0 && logits(2L) <= 0.0 && logits(4L) > 0.0,
      logits.toString)

    val (out, funnel) = Curation.curateObserved(docs, cfg)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L))
    val counts = funnel.counts
    // funnel: 4 in → 4 heuristically gated → 3 past the model tier
    // (doc 2 dies) → 2 past exact dedup (doc 3 dies)
    assert(counts("input") == 4L && counts("gated") == 4L &&
      counts("model_gated") == 3L && counts("exact_deduped") == 2L,
      counts.toString)
    // without the gate the funnel has no model counter and the word
    // salad survives
    val (out2, funnel2) = Curation.curateObserved(docs,
      cfg.copy(modelGate = None))
    assert(out2.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    assert(!funnel2.counts.contains("model_gated"))
  }
}
