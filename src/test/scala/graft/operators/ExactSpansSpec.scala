package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact substring-span dedup: winnowed anchors guarantee every
  * shared run ≥ minLen is found with EXACT boundaries — including the
  * off-stride splices the strided 16/8 window form misses.
  */
class ExactSpansSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  test("finds an off-stride duplicated span with exact boundaries") {
    // a 20-token run embedded at offset 5 in A and offset 9 in B —
    // neither offset on the stride-8 grid, and the strided form's
    // windows at 0/8/16 in A vs B never line up on the same 16-gram
    val run = (1 to 20).map(i => s"dup$i").mkString(" ")
    val a = ((1 to 5).map(i => s"a$i") :+ run).mkString(" ") +
      " " + (1 to 7).map(i => s"atail$i").mkString(" ")
    val b = ((1 to 9).map(i => s"b$i") :+ run).mkString(" ") +
      " " + (1 to 3).map(i => s"btail$i").mkString(" ")
    val c = (1 to 40).map(i => s"c$i").mkString(" ")
    val docs = Seq(doc(1, a), doc(2, b), doc(3, c)).toDF("doc_id", "text")

    val spans = ExactSpans.spans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(spans == Set((1L, 2L, 5, 9, 20)), s"got $spans")

    // the strided 16/8 form misses it: A's windows start at 0/8/16,
    // B's at 0/8/16 — no common 16-gram STRING between the two docs
    val strided = docs.withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(Decontaminate
        .stridedNgramsFromTokens(col("toks"), n = 16, stride = 8))
        .as("span"))
    val stridedDups = strided.as("x").join(strided.as("y"),
      col("x.span") === col("y.span") &&
        col("x.doc_id") < col("y.doc_id")).count()
    assert(stridedDups == 0,
      "planted splice unexpectedly visible to the strided form")
  }

  test("multiple disjoint runs and diagonals report separately; no false spans") {
    val r1 = (1 to 16).map(i => s"x$i").mkString(" ")
    val r2 = (1 to 17).map(i => s"y$i").mkString(" ")
    // A: r1 gap r2 ; B: r2 gap r1 (two diagonals)
    val a = s"$r1 g1 g2 g3 $r2"
    val b = s"$r2 h1 h2 $r1"
    val docs = Seq(doc(1, a), doc(2, b)).toDF("doc_id", "text")
    val spans = ExactSpans.spans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(spans == Set(
      (1L, 2L, 0, 19, 16),   // r1: A[0..16), B at 17 (r2) + 2 (gap)
      (1L, 2L, 19, 0, 17)),  // r2: A at 16 (r1) + 3 (gap)
      s"got $spans")
  }

  test("a run below minLen is not reported; >= minLen maximal, not clipped") {
    val short = (1 to 15).map(i => s"s$i").mkString(" ")
    val long = (1 to 30).map(i => s"l$i").mkString(" ")
    val docs = Seq(
      doc(1, s"$short p1 p2 $long"),
      doc(2, s"q1 $short q2 q3 $long")).toDF("doc_id", "text")
    val spans = ExactSpans.spans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(spans == Set((1L, 2L, 17, 18, 30)), s"got $spans")
  }

  test("removeSpans cuts the LATER doc's copy with exact boundaries") {
    val run = (1 to 20).map(i => s"dup$i").mkString(" ")
    val a = s"a1 a2 $run a3"
    val b = s"b1 b2 b3 $run b4 b5"
    val docs = Seq(doc(1, a), doc(2, b)).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val out = ExactSpans.removeSpans(docs, "doc_id", "toks")
      .select("doc_id", "n_tokens", "n_removed")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, r) => id -> ((n, r)) }.toMap
    assert(out(1L) == ((23L, 0L)), s"earlier doc must keep its copy: $out")
    assert(out(2L) == ((25L, 20L)), s"later doc loses exactly the run: $out")
    // the reassembled later doc is its non-duplicated remainder
    val fp = ExactSpans.removeSpans(docs, "doc_id", "toks")
      .filter(col("doc_id") === 2).select("clean_fp").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("b1 b2 b3 b4 b5".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == expect)
  }

  test("identical documents: one whole-doc span") {
    val t = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(doc(1, t), doc(2, t)).toDF("doc_id", "text")
    val spans = ExactSpans.spans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(spans == Set((1L, 2L, 0, 0, 25)))
  }
}
