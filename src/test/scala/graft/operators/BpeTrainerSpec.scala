package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed trainer must reproduce the sequential reference
  * exactly: same merge list (greedy global argmax with the
  * count-desc/pair-asc tiebreak) and the same re-tokenized corpus —
  * including the overlapping-run edge cases (aaa, aaaa) where
  * left-to-right non-overlapping application is what defines the
  * answer — under any partitioning.
  */
class BpeTrainerSpec extends SparkSpec {

  import spark.implicits._

  private def chars(w: String): Seq[String] = w.map(_.toString)

  private def runBoth(docs: Seq[Seq[String]], k: Int, parts: Int) = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks").repartition(parts)
    val (merges, corpus) = BpeTrainer.train(spark, df, "id", "toks", k)
    val got = corpus.orderBy(col("id")).collect()
      .map(_.getSeq[String](1).toSeq).toSeq
    val (refMerges, refCorpus) = BpeTrainer.referenceTrain(docs, k)
    (merges, got, refMerges, refCorpus)
  }

  test("classic BPE example: merges and corpus match the reference") {
    val docs = Seq("low", "low", "lower", "newest", "newest", "newest",
      "widest", "widest").map(chars)
    val (m, c, rm, rc) = runBoth(docs, 6, 3)
    assert(m == rm)
    assert(c == rc)
    assert(m.nonEmpty && m.head._1.nonEmpty)
  }

  test("overlapping runs: aaa/aaaa left-to-right semantics") {
    val docs = Seq("aaa", "aaaa", "aa", "a").map(chars)
    val (m, c, rm, rc) = runBoth(docs, 3, 2)
    assert(m == rm)
    assert(c == rc)
    // first merge must be (a,a); aaaa -> [aa,aa], aaa -> [aa,a]
    assert(m.head == ("a", "a"))
  }

  test("encode: trained merges tokenize UNSEEN docs like the reference") {
    val train = Seq("low", "low", "lower", "newest", "newest", "newest",
      "widest", "widest").map(chars)
    val df = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val (merges, _) = BpeTrainer.train(spark, df, "id", "toks", 6)
    val unseen = Seq("lowest", "newer", "wide", "xyz").map(chars)
    val udf2 = unseen.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val got = BpeTrainer.encode(udf2, "id", "toks", merges)
      .orderBy(col("id")).collect().map(_.getSeq[String](1).toSeq).toSeq
    assert(got == BpeTrainer.referenceEncode(unseen, merges))
    // encoding compresses: a doc made of trained subwords shrinks
    assert(got.head.size < unseen.head.size)
  }

  test("stops when no pair repeats; partition invariance") {
    val docs = Seq("abc", "def").map(chars)
    val (m, c, rm, rc) = runBoth(docs, 5, 2)
    assert(m == rm && m.isEmpty)
    assert(c == rc)
    val big = (1 to 60).map(i => s"token${i % 7}x").map(chars)
    val a = runBoth(big, 4, 1)
    val b = runBoth(big, 4, 11)
    assert(a._1 == b._1 && a._2 == b._2)
  }
}
