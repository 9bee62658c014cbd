package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("rolling-hash fingerprint: identical docs share all hashes, shifted docs overlap, unrelated don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "the quick brown fox jumps over the lazy dog by the river"), // identical
      (3L, "PREFIX added: the quick brown fox jumps over the lazy dog by the river"), // shifted
      (4L, "zzz completely different content with nothing shared qqq xyz"),
    ).toDF("id", "text")
      .select($"id", TextFunctions.rollingHashFingerprint($"text").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap

    def overlap(a: Seq[Long], b: Seq[Long]): Int = a.toSet.intersect(b.toSet).size
    assert(docs(1L) == docs(2L))
    // rolling windows make the shifted copy share most minima
    assert(overlap(docs(1L), docs(3L)) >= docs(1L).size / 2)
    assert(overlap(docs(1L), docs(4L)) == 0)
  }

  test("bpe-ish token count exceeds whitespace token count") {
    val r = Seq(("a1", "hello world, tokenization-test 12345"))
      .toDF("id", "text")
      .select(TextFunctions.tokenCount($"text").as("ws"),
        TextFunctions.bpeTokenCount($"text").as("bpe"))
      .as[(Int, Int)].head()
    assert(r._2 > r._1)
  }
}
