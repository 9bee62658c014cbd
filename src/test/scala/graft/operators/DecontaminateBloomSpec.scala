package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The bloom-prefiltered decontamination path must be verdict-identical
  * to the exact broadcast path: a bloom filter has no false negatives
  * (no hit can be lost) and the exact verify join kills every false
  * positive — so even a deliberately saturated, tiny filter may cost
  * probe work but can never change a row.
  */
class DecontaminateBloomSpec extends SparkSpec {

  import spark.implicits._

  private def corpus: (DataFrame, DataFrame) = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalDocs = Seq(
      (1000L, base + " lambda mu"),
      (1001L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, base + " lambda mu nu xi"),             // heavy overlap
      (2L, "totally different words that never appear in the eval suite at all right"),
      (3L, "one two three four five six seven eight " +
        "then diverging content follows here afterwards"), // partial
      (4L, "short doc"))                            // < n tokens
      .toDF("doc_id", "text")
    (train, evalDocs)
  }

  private def collectReport(df: DataFrame) =
    df.select("doc_id", "n_ngrams", "n_matched", "contaminated")
      .as[(Long, Int, Long, Boolean)].collect().toSet

  test("bloom path == exact path on planted overlaps") {
    val (train, eval) = corpus
    val exact = collectReport(
      Decontaminate.report(train, eval, "doc_id", "text", n = 8))
    val bloom = collectReport(
      Decontaminate.reportBloom(train, eval, "doc_id", "text", n = 8))
    assert(exact == bloom)
    // and the plant worked: doc 1 contaminated, doc 2 clean, doc 4 zero-gram
    val verdicts = exact.map(r => r._1 -> r._4).toMap
    assert(verdicts(1L) && !verdicts(2L) && !verdicts(4L))
    assert(exact.find(_._1 == 4L).get._2 == 0)
  }

  test("a saturated filter (forced false positives) still changes nothing") {
    val (train, eval) = corpus
    val exact = collectReport(
      Decontaminate.report(train, eval, "doc_id", "text", n = 8))
    // 64 bits for dozens of grams: nearly every probe reports "maybe",
    // so the exact verify join is doing all the work — verdicts and
    // counts must still match the ground truth exactly
    val bloom = collectReport(
      Decontaminate.reportBloom(train, eval, "doc_id", "text", n = 8,
        expectedGrams = 4L, numBits = 64L))
    assert(exact == bloom)
  }
}
