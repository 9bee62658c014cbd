package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  // 12-token docs; n=4 grams. Doc 10 copies eval doc 1 verbatim
  // (fully contaminated), doc 11 shares a 6-token span with eval doc 2
  // (partial), doc 12 is clean, doc 13 is too short for any 4-gram.
  private val eval = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
  ).toDF("doc_id", "text")

  private val train = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (11L, "prefix words here then three four five six seven eight trailing tail"),
    (12L, "totally unrelated training document with no overlapping span at all here"),
    (13L, "too short"),
  ).toDF("doc_id", "text")

  test("n-gram overlap report: verbatim copy, partial span, clean, short") {
    val r = Decontaminate.report(train, eval, "doc_id", "text",
        n = 4, threshold = 0.2)
      .select("doc_id", "n_ngrams", "n_matched", "contaminated")
      .as[(Long, Int, Long, Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap

    // 12 tokens -> 9 distinct 4-grams; verbatim copy matches all 9
    assert(r(10L) == ((9, 9L, true)))
    // 6-token shared span "three four five six seven eight" -> 3 4-grams
    assert(r(11L) == ((9, 3L, true)))
    assert(r(12L) == ((8, 0L, false))) // 11 tokens -> 8 distinct 4-grams
    // below n tokens: zero grams, ratio defined as 0, not contaminated
    assert(r(13L) == ((0, 0L, false)))
  }

  test("threshold separates partial from verbatim contamination") {
    val r = Decontaminate.report(train, eval, "doc_id", "text",
        n = 4, threshold = 0.5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(r(10L))     // 9/9 >= 0.5
    assert(!r(11L))    // 3/9 < 0.5
  }

  test("hashed-grams mode reproduces the string-mode report exactly") {
    def collect(hashed: Boolean) =
      Decontaminate.report(train, eval, "doc_id", "text",
          n = 4, threshold = 0.2, hashGrams = hashed)
        .select("doc_id", "n_ngrams", "n_matched",
          "contamination_ratio", "contaminated")
        .as[(Long, Int, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(collect(hashed = true) == collect(hashed = false))
  }

  test("eval n-gram set deduplicates across eval docs (no double count)") {
    val dupEval = eval.union(eval) // same grams twice
    val r = Decontaminate.report(train, dupEval, "doc_id", "text", n = 4)
      .filter(col("doc_id") === 10L)
      .select("n_matched").as[Long].head()
    assert(r == 9L)
  }
}
