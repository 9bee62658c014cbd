package graft.operators

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
}
