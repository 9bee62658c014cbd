package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the recall property the round-2 exact-length blocking lacked:
  * a near-dup pair whose edit CHANGES the length (insert/delete) must
  * still be reachable. Width-W buckets with adjacent-bucket probing
  * guarantee it for any edit shorter than W characters.
  */
class EditDistanceBlockingSpec extends SparkSpec {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"

  // docs 1/2: one-char insertion (length 60 vs 61 — DIFFERENT n_chars,
  // so exact-length blocking provably paired them never); placed so the
  // two lengths straddle a bucket boundary too (60/16=3, 61/16=3 — same
  // bucket; docs 3/4 straddle buckets 3 and 4). doc 5 is another lang.
  private def doc(id: Long, lang: String, text: String) =
    (id, lang, text.length, text)

  private val docs = Seq(
    doc(1L, "en", base),                       // 60 chars, bucket 3
    doc(2L, "en", base + "!"),                 // 61 chars, bucket 3
    doc(3L, "en", "x" * 63),                   // bucket 3
    doc(4L, "en", "x" * 64 + "y"),             // 65 chars, bucket 4
    doc(5L, "de", base),                       // same text, other lang
  ).toDF("doc_id", "lang", "n_chars", "text")

  private val pairs = TextQueries.editDistancePairs(docs)
    .select("id_a", "id_b", "edit_dist")
    .as[(Long, Long, Int)].collect()
    .map(p => (p._1, p._2) -> p._3).toMap

  test("length-changing edit is reachable (old exact-length block missed it)") {
    assert(pairs.get((1L, 2L)).contains(1))
  }

  test("adjacent buckets pair across the bucket boundary") {
    // 63 chars (bucket 3) vs 65 chars (bucket 4): 2 edits apart,
    // reachable only because probes include the neighboring bucket
    assert(pairs.get((3L, 4L)).contains(2))
  }

  test("blocking respects lang and emits each pair exactly once") {
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((5L, 1L)))
    val all = TextQueries.editDistancePairs(docs)
      .groupBy(col("id_a"), col("id_b")).count()
      .filter(col("count") > 1).count()
    assert(all == 0L)
  }
}
