package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curation

/** Streaming counterpart of `Curation.curate` for continuous corpus
  * ingest: the narrow stages (language filter, quality gate, stats) are
  * the SAME Column expressions the batch pipeline uses — they run
  * unchanged over a stream — and exact dedup becomes stateful
  * cross-batch suppression keyed by content fingerprint
  * (`StreamingDedup.firstPerKey`, state bounded by TTL).
  *
  * Near-duplicate (LSH) dedup is deliberately NOT streamed: the band
  * self-join over an unbounded stream would accumulate unbounded
  * state. The standard design splits it — stream-side exact dedup +
  * quality gating on ingest, periodic batch `Curation.curate` over the
  * accumulated shard for near-dedup compaction (same operators, same
  * thresholds).
  */
object StreamingCuration {

  final case class DocRow(doc_id: Long, text: String, lang: String)

  final case class CuratedDoc(
      doc_id: Long,
      text: String,
      lang: String,
      fp: String,
      n_tokens: Int)

  /** Gate + fingerprint + first-seen-wins dedup over a (streaming or
    * batch) Dataset. `stateTtlMs` bounds the dedup state store to the
    * active-fingerprint working set (0 = keep forever).
    */
  def curateStream(docs: Dataset[DocRow], cfg: Curation.Config,
      stateTtlMs: Long = 0L): Dataset[CuratedDoc] = {
    import docs.sparkSession.implicits._
    val langFiltered =
      if (cfg.keepLangs.isEmpty) docs.toDF()
      else TextFunctions.withLangScores(docs.toDF())
        .filter(col("predicted_lang")
          .isin(cfg.keepLangs.toSeq.map(lit(_)): _*))
        .select(docs.columns.toSeq.map(col): _*)
    val gated = langFiltered
      .filter(Curation.qualityGate(col("text"), cfg))
      .withColumn("fp", md5(TextFunctions.normalize(col("text"))))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("fp"),
        col("n_tokens"))
      .as[CuratedDoc]
    StreamingDedup.firstPerKey[CuratedDoc](gated, _.fp, stateTtlMs)
  }

  /** Streaming NEAR-dedup against a persisted LSH index
    * (`Dedup.writeLshIndex`): each micro-batch runs the batch
    * `Curation.curateIncremental` via foreachBatch — gates, then
    * drops rows near-dupping the index or earlier rows of the SAME
    * batch — and hands survivors to `sink`. Cross-BATCH near-dup
    * state lives in the index, refreshed on the caller's cadence
    * (append survivors + periodic `writeLshIndex` rebuild); between
    * refreshes, near-dups of not-yet-indexed survivors are the
    * accepted staleness — the unbounded-band-state problem the
    * streaming self-join would otherwise have.
    *
    * Returns a started query; trigger/checkpoint come pre-configured
    * by the caller on `writer` semantics via the returned builder —
    * call `.start()` after setting them.
    */
  def nearDedupStream(docs: Dataset[DocRow], indexDir: String,
      cfg: Curation.Config)(
      sink: org.apache.spark.sql.DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[DocRow] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[DocRow], _: Long) =>
        val survivors =
          Curation.curateIncremental(batch.toDF(), indexDir, cfg)
        sink(survivors)
        ()
      }
}
