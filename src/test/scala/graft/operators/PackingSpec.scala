package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("packing: sequences respect the token budget, sequences never span shards") {
    val docs = (1L to 300L).map(i => (i, 50 + (i % 37).toInt))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "n_tokens", "doc_id",
      budget = 512, shards = 4)
      .select("doc_id", "n_tokens", "shard", "seq_id", "seq_offset")
      .as[(Long, Int, Long, Long, Long)].collect()

    // a doc's start offset determines its sequence; docs starting in
    // the same 512-token cell of the same shard share a seq_id
    packed.groupBy(_._4).foreach { case (_, group) =>
      assert(group.map(_._3).distinct.length == 1) // one shard per seq
      val starts = group.map(_._5)
      assert(starts.max - starts.min < 512)
    }
    // offsets are a proper running sum per shard
    packed.groupBy(_._3).foreach { case (_, group) =>
      val sorted = group.sortBy(_._1)
      sorted.foldLeft(0L) { case (expected, (_, n, _, _, off)) =>
        assert(off == expected)
        expected + n
      }
    }
  }
}
