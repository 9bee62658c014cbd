package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end training-data curation: the composed pipeline a 100 TB
  * corpus actually runs, built from this engine's operators:
  *
  *   1. language filter        (lang-ID heuristic, narrow)
  *   2. quality gate           (length / stopword-ratio bounds, narrow)
  *   3. exact dedup            (md5 hash-groupBy — one shuffle)
  *   4. near dedup             (MinHash LSH + component clustering)
  *   5. stats                  (token counts per surviving doc)
  *
  * Stage order is the cost order: cheap narrow filters first shrink
  * the corpus before any shuffle; exact dedup (cheap, one shuffle)
  * runs before LSH (signature compute + band join); clustering runs
  * only on the LSH survivors' pair graph.
  */
object Curation {

  final case class Config(
      keepLangs: Set[String] = Set("en"),
      minTokens: Int = 8,
      maxTokens: Int = 100000,
      minStopRatio: Double = 0.0,
      nearDupThreshold: Double = 0.8,
      // MinHash feature space: 1 = bag-of-words, n>=2 = n-token
      // shingles (see Dedup.features)
      nearDupNgram: Int = 3,
      // model-based quality tier (r12): docs whose [[QualityModel]]
      // logit is <= the threshold are gated out AFTER the heuristic
      // gate and BEFORE any shuffle — the FineWeb-Edu-style
      // heuristics -> model -> dedup funnel as ONE call. The score is
      // a literal-weight codegen'd Column, so the tier rides the same
      // scan as the heuristic gate (no extra pass, no UDF).
      modelGate: Option[(QualityModel.Model, Double)] = None)

  /** Quality gate predicate over a text column. */
  def qualityGate(text: Column, cfg: Config): Column = {
    val nTokens = TextFunctions.tokenCount(text)
    val stopRatio = TextFunctions.stopwordCount(text).cast("double") / nTokens
    nTokens.between(cfg.minTokens, cfg.maxTokens) &&
      stopRatio >= cfg.minStopRatio
  }

  /** Run the full pipeline over a (doc_id, text, ...) corpus; returns
    * surviving docs with curation stats columns appended.
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame =
    curateTapped(docs, cfg, (_, df) => df)

  /** Per-stage funnel counters riding the pipeline's OWN jobs via
    * `observe` (CollectMetrics): at 100 TB a monitoring recount of
    * each intermediate stage would double the pipeline's scan cost —
    * these aggregates piggyback on rows already flowing through the
    * executors, so the funnel (rows in → post-gate → post-exact-dedup
    * → survivors) costs zero extra passes. Read the maps AFTER an
    * action has materialized the result (`Observation.get` blocks on
    * the first query execution that ran its stage).
    */
  final case class Funnel(
      input: org.apache.spark.sql.Observation,
      gated: org.apache.spark.sql.Observation,
      exactDeduped: org.apache.spark.sql.Observation,
      // present iff the pipeline ran with Config.modelGate — the model
      // tier's counter rides the same piggybacked pass as the others
      modelGated: Option[org.apache.spark.sql.Observation] = None) {
    /** Stage → rows, once an action has run. */
    def counts: Map[String, Long] = Map(
      "input" -> input.get("rows").asInstanceOf[Long],
      "gated" -> gated.get("rows").asInstanceOf[Long],
      "exact_deduped" -> exactDeduped.get("rows").asInstanceOf[Long]) ++
      modelGated.map(o =>
        "model_gated" -> o.get("rows").asInstanceOf[Long])
    /** Mean input document length, from the same piggybacked pass
      * (0.0 for an empty corpus rather than 0/0 = NaN).
      */
    def meanInputChars: Double = {
      val rows = input.get("rows").asInstanceOf[Long]
      if (rows == 0L) 0.0
      else input.get("chars").asInstanceOf[Long].toDouble / rows
    }
  }

  /** [[curate]] with the funnel counters attached. */
  def curateObserved(docs: DataFrame, cfg: Config = Config())
      : (DataFrame, Funnel) = {
    import org.apache.spark.sql.Observation
    // no-arg Observation = auto-unique metric names: two observed
    // pipelines combined in ONE action (union of two curated corpora)
    // would otherwise collide on duplicate observed-metric names and
    // fail analysis
    val funnel = Funnel(Observation(), Observation(), Observation(),
      modelGated = cfg.modelGate.map(_ => Observation()))
    val taps: Map[String, (Observation, Seq[Column])] = Map(
      "input" -> ((funnel.input, Seq(count(lit(1)).as("rows"),
        coalesce(sum(length(col("text"))), lit(0L)).as("chars")))),
      "gated" -> ((funnel.gated, Seq(count(lit(1)).as("rows")))),
      "exact_deduped" -> ((funnel.exactDeduped,
        Seq(count(lit(1)).as("rows"))))) ++
      funnel.modelGated.map(o =>
        "model_gated" -> ((o, Seq(count(lit(1)).as("rows")))))
    val out = curateTapped(docs, cfg, (stage, df) =>
      taps.get(stage).map { case (obs, aggs) =>
        df.observe(obs, aggs.head, aggs.tail: _*)
      }.getOrElse(df))
    (out, funnel)
  }

  private def curateTapped(docs0: DataFrame, cfg: Config,
      tap: (String, DataFrame) => DataFrame): DataFrame = {
    val docs = tap("input", docs0)
    // 1-2: narrow filters — no shuffle, codegen'd, run at scan speed
    val langFiltered =
      if (cfg.keepLangs.isEmpty) docs
      else TextFunctions.withLangScores(docs)
        .filter(col("predicted_lang").isin(cfg.keepLangs.toSeq.map(lit(_)): _*))
        .select(docs.columns.toSeq.map(col): _*)
    val gated = tap("gated",
      langFiltered.filter(qualityGate(col("text"), cfg)))

    // 2b: model tier (when configured) — a codegen'd linear logit
    // over the same narrow scan; strict > so the kept set is the
    // exact complement of the gated-out set under IEEE equality
    val tiered = cfg.modelGate match {
      case None => gated
      case Some((m, thr)) => tap("model_gated",
        gated.filter(QualityModel.score(m)(col("text")) > lit(thr)))
    }

    // 3: exact dedup — keep lowest doc_id per content hash (min_by:
    // single hash-agg, map-side partial collapses dups early). Persisted:
    // stage 4 scans the survivors three times (LSH signatures, Jaccard
    // word sets, final anti-join) and each rescan would re-run stages 1-3
    val hashed = tiered.withColumn("__fp",
      md5(TextFunctions.normalize(col("text"))))
    val exactSurvivors = tap("exact_deduped", hashed
      .groupBy(col("__fp"))
      .agg(min_by(struct(tiered.columns.toSeq.map(col): _*), col("doc_id")).as("r"))
      .select(tiered.columns.toSeq.map(c => col(s"r.$c")): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4: near dedup — LSH candidates -> exact-Jaccard pairs ->
    // connected components -> keep cluster minimum
    val survivors = Dedup.minhashDedupClusters(
      exactSurvivors, "doc_id", "text", cfg.nearDupThreshold,
      cfg.nearDupNgram)

    // 5: per-doc stats for downstream sampling/packing
    survivors
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("n_chars", length(col("text")))
  }

  /** Incremental curation: gate a NEW ingest batch, then drop every
    * row that near-dups the corpus behind `indexDir` (written by
    * `Dedup.writeLshIndex`) or an earlier row of the same batch —
    * the steady-state shape once a corpus exists: per-batch cost is
    * O(batch), the indexed history is never re-read as text. Returns
    * surviving batch rows with stats, ready to append to the corpus
    * (and to [[graft.operators.Dedup.writeLshIndex]]'s next refresh).
    */
  def curateIncremental(newDocs: DataFrame, indexDir: String,
      cfg: Config = Config()): DataFrame = {
    val langFiltered =
      if (cfg.keepLangs.isEmpty) newDocs
      else TextFunctions.withLangScores(newDocs)
        .filter(col("predicted_lang").isin(cfg.keepLangs.toSeq.map(lit(_)): _*))
        .select(newDocs.columns.toSeq.map(col): _*)
    val heuristic = langFiltered.filter(qualityGate(col("text"), cfg))
    // the model tier applies to the incremental path too (r12): a
    // configured gate silently not firing here would let every batch
    // bypass the tier the batch pipeline enforces
    val gated = (cfg.modelGate match {
      case None => heuristic
      case Some((m, thr)) =>
        heuristic.filter(QualityModel.score(m)(col("text")) > lit(thr))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every batch row that near-dups the index or an earlier batch
    // row (the index's own metadata fixes the feature space — the
    // write-time ngram wins over cfg.nearDupNgram by construction)
    val losers = Dedup.dedupAgainstIndex(gated, "doc_id", "text",
      indexDir, cfg.nearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    gated.join(losers, Seq("doc_id"), "left_anti")
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("n_chars", length(col("text")))
  }
}
