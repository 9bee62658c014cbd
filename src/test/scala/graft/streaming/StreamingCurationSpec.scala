package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Curation
import graft.streaming.StreamingCuration.{CuratedDoc, DocRow}

/** Streaming ingest curation: quality gate drops bad docs in-flight,
  * exact dedup suppresses content re-ingested in later micro-batches
  * (checkpointed state), stats columns appended — the batch pipeline's
  * semantics over an unbounded source.
  */
class StreamingCurationSpec extends SparkSpec {

  import spark.implicits._

  test("gates, fingerprints, and dedups across micro-batches") {
    val root = tmpDir("scur")
    val srcDir = s"$root/src"
    val collected = new scala.collection.mutable.ArrayBuffer[CuratedDoc]()
    val cfg = Curation.Config(keepLangs = Set.empty, minTokens = 5)

    def drain(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
        .parquet(srcDir).as[DocRow]
      val q = StreamingCuration.curateStream(src, cfg).writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[CuratedDoc], _: Long) =>
            collected.synchronized { collected ++= b.collect() }
            ()
        }
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    // batch 1: a good doc, a too-short doc (gated), an exact dup
    Seq(
      DocRow(1L, "the quick brown fox jumps over the lazy dog", "en"),
      DocRow(2L, "too short", "en"),
      DocRow(3L, "The Quick Brown Fox jumps over the lazy dog", "en"), // same after normalize
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(collected.map(_.doc_id).toSet == Set(1L))
    assert(collected.head.n_tokens == 9)

    // batch 2: re-ingest of doc 1's content (suppressed via state) +
    // a genuinely new doc (kept)
    Seq(
      DocRow(4L, "the quick brown fox jumps over the lazy dog", "en"),
      DocRow(5L, "completely fresh content about spark streaming state stores", "en"),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(collected.map(_.doc_id).toSet == Set(1L, 5L))
  }

  test("near-dedup stream drops index-dups per micro-batch") {
    val root = tmpDir("snear")
    val srcDir = s"$root/src"
    val idxDir = s"$root/idx"
    val collected = new scala.collection.mutable.ArrayBuffer[Long]()

    // index an existing corpus once (bag-of-words feature space)
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
      .pipe(d => graft.operators.Dedup
        .writeLshIndex(d, "doc_id", "text", idxDir, ngram = 1))

    // stream batch: a word-shuffled near-copy of the indexed doc, an
    // in-batch near-dup pair, and a novel doc
    Seq(
      DocRow(101L, "lazy dog tonight the quick brown fox jumps over the", "en"),
      DocRow(102L, "fresh ingest rows arriving with almost identical payloads here", "en"),
      DocRow(103L, "fresh ingest rows arriving with almost identical payloads there", "en"),
      DocRow(104L, "and one genuinely novel document matching nothing else", "en"),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)

    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
      .parquet(srcDir).as[DocRow]
    val cfg = Curation.Config(keepLangs = Set.empty, minTokens = 1,
      nearDupThreshold = 0.7, nearDupNgram = 1)
    val q = StreamingCuration.nearDedupStream(src, idxDir, cfg) { b =>
      collected.synchronized {
        collected ++= b.select("doc_id").collect().map(_.getLong(0))
      }
    }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    // 101 dups the index; 103 dups 102 within the batch
    assert(collected.toSet == Set(102L, 104L))
  }

  test("index refresh mid-stream: next batch dedups against refreshed corpus") {
    val root = tmpDir("srefresh")
    val srcDir = s"$root/src"
    val idxDir = s"$root/idx"
    val collected = new scala.collection.mutable.ArrayBuffer[Long]()
    val cfg = Curation.Config(keepLangs = Set.empty, minTokens = 1,
      nearDupThreshold = 0.7, nearDupNgram = 1)

    def drain(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
        .parquet(srcDir).as[DocRow]
      val q = StreamingCuration.nearDedupStream(src, idxDir, cfg) { b =>
        collected.synchronized {
          collected ++= b.select("doc_id").collect().map(_.getLong(0))
        }
      }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    val indexed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"))
    indexed.toDF("doc_id", "text")
      .pipe(d => graft.operators.Dedup
        .writeLshIndex(d, "doc_id", "text", idxDir, ngram = 1))

    // batch 1: a novel survivor + a near-dup of the indexed corpus
    Seq(
      DocRow(201L, "brand new survivor content that matches nothing indexed yet", "en"),
      DocRow(202L, "tonight the lazy dog quick brown fox jumps over the", "en"),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(collected.toSet == Set(201L))

    // REFRESH on the caller's cadence: rebuild the index over the old
    // corpus plus batch-1 survivors. nearDedupStream re-reads the
    // index dir every micro-batch (curateIncremental is index-driven),
    // so the next drain must suppress near-dups of doc 201 — content
    // that between refreshes would have been the accepted staleness.
    (indexed ++ Seq((201L,
      "brand new survivor content that matches nothing indexed yet")))
      .toDF("doc_id", "text")
      .pipe(d => graft.operators.Dedup
        .writeLshIndex(d, "doc_id", "text", idxDir, ngram = 1))

    // batch 2: near-dup of the batch-1 survivor (now suppressed via the
    // refreshed index), near-dup of the ORIGINAL corpus (still
    // suppressed), and a genuinely novel doc (kept)
    Seq(
      DocRow(301L, "survivor content brand new that matches nothing yet indexed", "en"),
      DocRow(302L, "the lazy dog tonight jumps the quick brown fox over", "en"),
      DocRow(303L, "an entirely different document about distributed stream processing", "en"),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(collected.toSet == Set(201L, 303L),
      s"cross-refresh suppression failed: got ${collected.toSet}")
  }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
