package graft.operators

import graft.SparkSpec

class CurationObserveSpec extends SparkSpec {

  import spark.implicits._

  test("funnel counters ride the pipeline's own jobs and match recounts") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (3L, "the quick brown fox jumps over the lazy dog near a river tonight"),
      (4L, "too short"),
      (5L, "colorless green ideas sleep furiously without common words here today"),
      (6L, "a completely different account of the history of steam engines in europe"),
    ).toDF("doc_id", "text")
    val cfg = Curation.Config(
      keepLangs = Set.empty,
      minTokens = 5,
      minStopRatio = 0.05,
      nearDupThreshold = 0.7)

    val (out, funnel) = Curation.curateObserved(docs, cfg)
    val survivors = out.select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 6L))

    // independent recounts of each stage
    val c = funnel.counts
    assert(c("input") == 6L)
    val gateRecount = docs
      .filter(Curation.qualityGate(org.apache.spark.sql.functions.col("text"), cfg))
      .count()
    assert(c("gated") == gateRecount) // 4: drops ids 4 (short), 5 (stop ratio)
    assert(c("exact_deduped") == 3L) // id 2 collapses into 1
    // monotone funnel ending at the returned survivor count
    assert(c("input") >= c("gated")
      && c("gated") >= c("exact_deduped")
      && c("exact_deduped") >= survivors.size)

    // byte statistics piggyback on the same pass
    val meanChars = docs
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.length($"text")))
      .head().getDouble(0)
    assert(math.abs(funnel.meanInputChars - meanChars) < 1e-9)
  }
}
