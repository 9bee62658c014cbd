package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-2 training-data-pipeline additions: PII scrubbing, Gopher-style
  * repetition quality, TF-IDF term weighting, deterministic stratified
  * sampling, and int8 embedding quantization — the curation ops a
  * 100 TB corpus pipeline runs between dedup and packing. Each is a
  * pure-DataFrame design with a DuckDB oracle.
  *
  * Cross-engine determinism rules (same as the round-1 set): counts
  * stay integer (DuckDB SUM/LEN results cast to the Spark-side type),
  * ranking transforms avoid transcendentals (integer-scaled idf instead
  * of log), hashes are md5 (identical hex in both engines), and double
  * math is restricted to IEEE-exact ops on identical operands.
  */
object PipelineQueries {

  /** Conservative PII patterns that parse identically under Java regex
    * (Spark) and RE2 (DuckDB): email, NANP-style 555 phone, IPv4.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Scrub emails, phones, and IPv4s to redaction tokens. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Trigram shingles from a pre-materialized token array (empty below
    * 3 tokens). Takes the materialized column, not the text: an inline
    * `split` here would re-tokenize once per window (the same
    * O(n²)-via-recomputation trap as `Dedup.minhashFromHashes`
    * documents).
    */
  def trigramsFromTokens(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Convenience single-expression form (tests / small inputs); prefer
    * `TextFunctions.tokens` materialized + [[trigramsFromTokens]] in
    * pipelines.
    */
  def trigrams(text: Column): Column =
    trigramsFromTokens(TextFunctions.tokens(text))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII scrubbing over text with deterministically planted PII (the
    // synthetic corpus has none): plant -> detect counts -> redact.
    // Narrow per-doc regex work, embarrassingly parallel at scale.
    "text_pii_scrub" -> ((s, dir) => {
      Tables.documents(s, dir).repartition(col("doc_id"))
        .withColumn("synth", concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."), pmod(col("doc_id"), lit(255)).cast("string"),
          lit(".7")))
        .select(col("doc_id"),
          size(regexp_extract_all(col("synth"), lit(EmailRe), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("synth"), lit(PhoneRe), lit(0)))
            .as("n_phones"),
          size(regexp_extract_all(col("synth"), lit(IpRe), lit(0)))
            .as("n_ips"),
          scrubPii(col("synth")).as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition quality: distinct-token ratio + duplicate
    // trigram fraction, with the repetition filter flag
    "text_repetition" -> ((s, dir) => {
      Tables.documents(s, dir).repartition(col("doc_id"))
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("tg", trigramsFromTokens(col("toks")))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("distinct_token_ratio"),
          when(size(col("tg")) > 0,
            lit(1.0) - size(array_distinct(col("tg"))).cast("double") /
              size(col("tg")))
            .otherwise(lit(0.0)).as("dup_trigram_ratio"))
        .withColumn("is_repetitive", col("dup_trigram_ratio") > 0.1)
        .orderBy(col("doc_id"))
    }),

    // composite quality ruleset: the Gopher-style gate bundle as one
    // per-doc verdict — each signal a boolean flag, keep = none firing.
    // Narrow expressions over materialized token/trigram arrays.
    "text_quality_flags" -> ((s, dir) => {
      Tables.documents(s, dir).repartition(col("doc_id"))
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("tg", trigramsFromTokens(col("toks")))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          (TextFunctions.stopwordCount(col("text")).cast("double") /
            size(col("toks"))).as("stop_ratio"),
          when(size(col("tg")) > 0,
            lit(1.0) - size(array_distinct(col("tg"))).cast("double") /
              size(col("tg")))
            .otherwise(lit(0.0)).as("dup_trigram_ratio"))
        .withColumn("flag_short", col("n_tokens") < 16)
        .withColumn("flag_repetitive", col("dup_trigram_ratio") > 0.1)
        .withColumn("flag_lowstop", col("stop_ratio") < 0.01)
        .withColumn("keep",
          !col("flag_short") && !col("flag_repetitive") &&
            !col("flag_lowstop"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF term weighting: tf per (doc, term), df per term, idf as an
    // INTEGER-scaled ratio (1000·N div df — rank-monotone in N/df; log
    // damping is applied downstream, kept out of the oracle because
    // ln() differs across engines in the last ulp). Two shuffles (term,
    // (doc,term)) + a broadcast scalar N — the plan you'd run at scale.
    "text_tfidf_top" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // tf persisted: both df and the final join consume it, and
      // without the cache Catalyst re-derives the whole scan+explode
      // subtree for each consumer (.explain showed two Generate paths)
      val tf = docs
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // df via aggregation + join, NOT a window over term: map-side
      // partials collapse hot terms before the shuffle, and AQE can
      // split a skewed JOIN on stopword terms — it cannot split a
      // window partition holding every "the"-containing doc
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(n))
        // SQL `div`: truncating integer division, = DuckDB's `//`
        .withColumn("tfidf_scaled", expr("tf * ((1000 * n_docs) div df)"))
        .select(col("term"), col("doc_id"), col("tf"), col("df"),
          col("tfidf_scaled"))
        .orderBy(col("tfidf_scaled").desc, col("term"), col("doc_id"))
        .limit(20)
    }),

    // deterministic stratified sampling: md5-hex bucket of the doc id —
    // reproducible across engines, runs, and partitionings (no rand()),
    // the property a training-mix sampler actually needs. Keep-rate
    // 40/256 ≈ 15.6%, reported per language stratum.
    // deterministic train/val/test assignment: two md5-hex chars of
    // the doc id give 256 buckets split 80/10/10 (< cc / < e6 / rest)
    // — reproducible across engines, runs, and partitionings, with
    // disjointness by construction (one bucket, one split). Per-split
    // per-lang counts + an id checksum pin membership, not just sizes.
    "split_train_val_test" -> ((s, dir) => {
      val b = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      Tables.documents(s, dir)
        .withColumn("split",
          when(b < "cc", "train").when(b < "e6", "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("split"))
    }),

    "sample_stratified" -> ((s, dir) => {
      val bucket = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      Tables.documents(s, dir)
        .withColumn("sampled", bucket < "28")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          min(when(col("sampled"), col("doc_id"))).as("first_sampled_id"))
        .orderBy(col("lang"))
    }),

    // long-document chunking: overlapping token windows (window 128,
    // stride 96) for context-length packing — narrow explode, integer
    // math only, no shuffle
    "chunk_documents" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .select(col("doc_id"), col("n_tokens"),
          posexplode(sequence(lit(0),
            greatest((col("n_tokens") - 1).cast("long"), lit(0L)),
            lit(96L))).as(Seq("chunk_idx", "chunk_start")))
        .withColumn("chunk_len",
          least(lit(128L), col("n_tokens") - col("chunk_start")))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
          col("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // training-mix assembly: per source, admit docs in deterministic
    // md5 order until a token budget is hit — the "data mixing" op that
    // balances corpus composition. The running total is a DISTRIBUTED
    // prefix sum: a single per-source window would serialize a hot
    // source into one partition's sort at scale, so docs shard by the
    // FIRST md5 hex digit (a prefix of the order key, so shard order
    // aligns with global order), each shard windows locally in
    // parallel, and tiny per-shard totals chain into cross-shard
    // offsets. Result is identical to the naive single window — which
    // is exactly what the oracle runs.
    "mix_by_source" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bucket = md5(col("doc_id").cast("string").cast("binary"))
      val docs = Tables.documents(s, dir)
        .withColumn("n_tokens",
          TextFunctions.tokenCount(col("text")).cast("long"))
        .withColumn("b", bucket)
        .withColumn("shard", substring(col("b"), 1, 1))
      val localW = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("b"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val local = docs.withColumn("local_cum",
        sum(col("n_tokens")).over(localW))
      // per-(source, shard) totals -> running offset of PRIOR shards;
      // 16 rows per source, broadcast back
      val offsetW = Window.partitionBy(col("source")).orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy(col("source"), col("shard"))
        .agg(sum(col("n_tokens")).as("shard_tokens"))
        .withColumn("shard_offset",
          coalesce(sum(col("shard_tokens")).over(offsetW), lit(0L)))
        .select(col("source"), col("shard"), col("shard_offset"))
      local.join(broadcast(offsets), Seq("source", "shard"))
        .withColumn("cum_tokens", col("shard_offset") + col("local_cum"))
        .withColumn("selected", col("cum_tokens") <= 4000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
          sum(when(col("selected"), col("n_tokens")).otherwise(0L))
            .as("selected_tokens"))
        .orderBy(col("source"))
    }),

    // packed-sequence assembly: the text a trainer actually consumes —
    // docs of each packed sequence concatenated in stable doc_id order
    // with an end-of-doc separator (compared by md5 to keep rows
    // narrow). Sorted-collect makes the aggregation order-deterministic
    // under any partitioning.
    "pack_assemble" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing
        .packSequences(docs, "n_tokens", "doc_id", budget = 512, shards = 8)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("seq_tokens"),
          md5(array_join(
            transform(
              array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")),
            "<|eod|>")).as("packed_md5"))
        .orderBy(col("seq_id"))
    }),

    // benchmark decontamination: flag training docs sharing 8-gram
    // spans with a held-out eval split (doc_id % 20 = 0). Eval n-gram
    // set is tiny -> broadcast semi-join; the corpus side never
    // shuffles. See operators.Decontaminate for the scale story.
    "decontaminate_ngram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.report(
        train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        idCol = "doc_id", textCol = "text", n = 8, threshold = 0.2,
        spreadSmallInput = true) // single-file testdata → spread cores
        .orderBy(col("doc_id"))
    }),

    // bloom-prefiltered decontamination: same verdicts as
    // decontaminate_ngram (exact verify behind the filter), but the
    // eval side folds into one broadcast bloom instead of a broadcast
    // string set — the memory-bounded form for eval suites too big to
    // ship to every executor. Oracle = the exact formulation; a hash
    // match here PROVES the bloom is a pure prefilter.
    "decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.reportBloom(
        train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        idCol = "doc_id", textCol = "text", n = 8, threshold = 0.2,
        spreadSmallInput = true)
        .orderBy(col("doc_id"))
    }),

    // BM25 ranked retrieval for a fixed term query. Same determinism
    // discipline as text_tfidf_top: idf is the integer-scaled ratio
    // (1000·N div df), the tf/length normalization is pure double
    // arithmetic with an IDENTICAL expression tree in both engines,
    // and each term's contribution integerizes (floor×1e6) BEFORE the
    // per-doc sum so the aggregate is an associative BIGINT add —
    // never an order-sensitive double sum. k1=1.2, b=0.75.
    "text_bm25_topk" -> ((s, dir) => {
      val qTerms = Seq("spark", "query", "hash")
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = tok.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = tok
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf_scaled", expr("(1000 * n_docs) div df"))
        .withColumn("tf_norm",
          col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .withColumn("contrib",
          floor(col("tf_norm") * lit(1000000.0)) * col("idf_scaled"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms_matched"),
          sum(col("contrib")).as("bm25_scaled"))
        .orderBy(col("bm25_scaled").desc, col("doc_id"))
        .limit(15)
    }),

    // rarity quality signal: mean inverse global token frequency,
    // integer-scaled end to end ((1e6·N_total) div cnt per occurrence,
    // integer mean per doc) — rank-monotone in the real mean-ICF and
    // deterministic across engines with zero float ops. Vocabulary
    // counts stay a plain join (vocab outgrows broadcast at scale;
    // AQE broadcasts when it fits)
    "text_rarity_score" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      tok.join(counts, Seq("term"))
        .crossJoin(broadcast(total))
        .withColumn("contrib", expr("(1000000 * n_total) div cnt"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("contrib")).as("rarity_sum"))
        .withColumn("rarity_scaled", expr("rarity_sum div n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("rarity_scaled"))
        .orderBy(col("rarity_scaled").desc, col("doc_id"))
        .limit(20)
    }),

    // bigram-LM corpus likelihood (the CCNet/KenLM perplexity-filter
    // shape): train add-one-smoothed bigram counts on the corpus
    // itself, score each doc by its mean bigram likelihood. Everything
    // stays integer — per-bigram likelihood is scaled to parts-per-
    // billion by BIGINT division BEFORE the per-doc sum, so the doc
    // score is an associative integer sum (order-blind, engine-exact);
    // the monotone ln() that turns this into a true log-perplexity is
    // applied downstream of the gate, as with the scaled idf. Plan
    // shape: tokenize once, reduce to per-(doc,bigram) counts FIRST
    // (map-side combine collapses repeated bigrams), then re-aggregate
    // those partials into the model tables — so the expensive shuffles
    // move counts, never token streams. The model⋈corpus joins are
    // plain shuffle joins on (w1,w2)/w1: the model tables grow with
    // vocabulary, not corpus size, and AQE broadcasts them when they
    // fit. At 100 TB, hash the word pairs to 64-bit keys (strings only
    // exist here for oracle exactness) and drop the 1e9 scale to 1e6
    // so cnt*scale stays inside BIGINT.
    "text_bigram_lm" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val occ = toks.select(col("doc_id"),
          explode(expr("""zip_with(slice(toks, 1, size(toks)-1),
                          slice(toks, 2, size(toks)-1),
                          (a, b) -> named_struct('w1', a, 'w2', b))"""))
            .as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("occ"))
        // occ feeds the model tables AND the scoring join — persist so
        // the tokenize+explode+first-shuffle lineage runs once
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c12 = occ.groupBy(col("w1"), col("w2"))
        .agg(sum(col("occ")).as("cnt12"))
      val c1 = occ.groupBy(col("w1")).agg(sum(col("occ")).as("cnt1"))
      val vocab = toks.select(explode(col("toks")).as("term"))
        .agg(countDistinct(col("term")).as("v_size"))
      occ.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("lik_ppb",
          expr("(1000000000 * (cnt12 + 1)) div (cnt1 + v_size)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_bigrams"),
          sum(col("occ") * col("lik_ppb")).as("lm_sum"))
        .withColumn("lm_mean_ppb", expr("lm_sum div n_bigrams"))
        .orderBy(col("doc_id"))
    }),

    // boilerplate-span REMOVAL (the transform dedup_spans only
    // reports): cut each doc into non-overlapping 16-token chunks,
    // drop every chunk that occurs in ≥2 distinct docs (C4-style
    // cross-document boilerplate), and REASSEMBLE the surviving text
    // in original order. Duplicate detection is a partial-aggregated
    // groupBy(chunk) (hot chunks collapse map-side — no window over
    // the chunk key), removal is a left_anti join against the small
    // duplicate set (AQE broadcasts it), reassembly is the sorted-
    // collect concat. At 100 TB the chunk strings become 64-bit
    // hashes except in the final concat.
    "curate_span_removal" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).repartition(col("doc_id"))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_chunks", expr("(size(toks) - 1) div 16 + 1"))
      val chunks = docs.select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, (size(toks) - 1) div 16),
               i -> array_join(slice(toks, i * 16 + 1, 16), ' '))""")))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "chunk")
      val dup = chunks.groupBy(col("chunk"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select(col("chunk"))
      val cleaned = chunks.join(dup, Seq("chunk"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept_chunks"),
          expr("""array_join(transform(
                  array_sort(collect_list(struct(chunk_idx, chunk))),
                  x -> x.chunk), ' ')""").as("clean_text"))
      docs.select(col("doc_id"), col("n_chunks"))
        .join(cleaned, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept_chunks"), lit(0L)).as("n_kept_chunks"),
          md5(coalesce(col("clean_text"), lit("")).cast("binary"))
            .as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // DSIR-style importance weighting (Xie et al. '23 shape): hashed
    // n-gram features (unigrams + bigrams, md5 → 4096 buckets), a
    // bucket-level target/source likelihood-ratio model (target = the
    // src0-src3 slice, source = the whole corpus, add-one smoothing),
    // each doc scored by its occurrence-weighted mean ratio. Ratios
    // are scaled to parts-per-million by BIGINT division BEFORE the
    // per-doc sum (associative integer sum; the DSIR log is applied
    // downstream of the gate like the scaled idf). Plan: docs reduce
    // to per-(doc,bucket) counts first (map-side combine), the model
    // is EXACTLY 4096 rows regardless of corpus size — it re-derives
    // from those partials and broadcasts back, so scoring adds zero
    // shuffles beyond the one partial-agg exchange. At 100 TB only
    // the ppm scale needs care: (1e6·cnt_t·tot_s) must stay inside
    // BIGINT, so drop the scale or pre-divide totals past ~1e11
    // feature occurrences.
    "sample_dsir_weights" -> ((s, dir) => {
      val nBuckets = 4096
      val toks = Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
      val occ = toks.select(col("doc_id"), col("source"),
          explode(concat(col("toks"),
            expr("""zip_with(slice(toks, 1, size(toks)-1),
                    slice(toks, 2, size(toks)-1),
                    (a, b) -> concat(a, ' ', b))"""))).as("feat"))
        .withColumn("bucket",
          conv(substring(md5(col("feat").cast("binary")), 1, 8), 16, 10)
            .cast("long") % nBuckets)
        .groupBy(col("doc_id"), col("source"), col("bucket"))
        .agg(count(lit(1)).as("occ"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = occ.groupBy(col("bucket"))
        .agg(sum(col("occ")).as("cnt_s"),
          sum(when(col("source").isin("src0", "src1", "src2", "src3"),
            col("occ")).otherwise(0L)).as("cnt_t"))
      val totals = model.agg(sum(col("cnt_s")).as("tot_s"),
        sum(col("cnt_t")).as("tot_t"))
      val ratio = model.crossJoin(broadcast(totals))
        .withColumn("ratio_ppm",
          expr(s"(1000000 * (cnt_t + 1) * (tot_s + $nBuckets)) div " +
            s"((cnt_s + 1) * (tot_t + $nBuckets))"))
        .select(col("bucket"), col("ratio_ppm"))
      occ.join(broadcast(ratio), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_feats"),
          sum(col("occ") * col("ratio_ppm")).as("dsir_sum"))
        .withColumn("dsir_mean_ppm", expr("dsir_sum div n_feats"))
        .orderBy(col("doc_id"))
    }),

    // incremental stats maintenance: per-lang char-length statistics
    // assembled by MERGING per-batch algebraic partials (three ingest
    // batches by id range) — never rescanning history. The oracle is a
    // full one-shot recompute, so the hash-match proves merge ≡
    // recompute; mean/variance derive from identical integer partials
    // in both engines (IEEE-exact same ops, same order).
    "incremental_stats" -> ((s, dir) => {
      import graft.operators.IncrementalStats
      val docs = Tables.documents(s, dir)
      def batch(lo: Long, hi: Long) =
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      IncrementalStats.finalize(IncrementalStats.merge(
        IncrementalStats.partials(batch(0, 200), "lang", "n_chars"),
        IncrementalStats.partials(batch(200, 400), "lang", "n_chars"),
        IncrementalStats.partials(batch(400, Long.MaxValue), "lang", "n_chars")))
        .orderBy(col("lang"))
    }),

    // repeated-span detection (corpus-INTERNAL exact-substring dedup,
    // vs decontaminate_ngram's train-vs-eval overlap): strided
    // 16-token windows. Span multiplicity comes from groupBy(span)
    // .count(), NOT a window over the span key: the groupBy plans a
    // partial HashAggregate before its exchange, so a hot boilerplate
    // span collapses to one row per map task instead of funneling
    // every occurrence through a single reducer — the window form
    // cannot partial-aggregate and dies on skew at 100x. Only spans
    // seen in >=2 docs survive the filter, so the join-back side is
    // the (small) duplicate-span set — AQE broadcasts it when it fits
    // and skew-splits the probe when it doesn't. At 100 TB, hash the
    // spans (the strings only exist here for oracle exactness).
    "dedup_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).repartition(col("doc_id"))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("spans", array_distinct(
          graft.operators.Decontaminate
            .stridedNgramsFromTokens(col("toks"), n = 16, stride = 8)))
      val exploded = docs.select(col("doc_id"),
        size(col("spans")).as("n_spans"),
        explode_outer(col("spans")).as("span"))
      val dupSpans = exploded
        .groupBy(col("span")).agg(count(lit(1)).as("span_docs"))
        .filter(col("span").isNotNull && col("span_docs") >= 2)
        .select(col("span"), lit(1L).as("is_dup"))
      exploded
        .join(dupSpans, Seq("span"), "left")
        .groupBy(col("doc_id"))
        .agg(max(col("n_spans")).as("n_spans"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_spans"))
        .withColumn("dup_ratio",
          when(col("n_spans") > 0,
            col("n_dup_spans").cast("double") / col("n_spans"))
            .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    }),

    // EXACT substring-span dedup (round-7): winnowed positional
    // fingerprints (every-position rolling hash, rightmost-min
    // winnowing — the Schleimer/Wilkerson/Aiken guarantee) find every
    // maximal shared token run >= 16 with exact boundaries, where
    // dedup_spans' strided windows only estimate ratios and miss
    // off-stride splices. The corpus plants them: each sampled doc
    // gets a clone whose copy sits behind a 3-token prefix — off any
    // stride-8 grid. Oracle = ground truth via every-position
    // 16-grams + diagonal gaps-and-islands (no hashes oracle-side, so
    // a green row proves the winnowing guarantee held for every run).
    "dedup_spans_exact" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"),
          slice(split(col("text"), " "), 1, 60).as("toks"))
      val clones = base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(array(lit("px"), lit("qx"), lit("rx")),
          slice(col("toks"), 1, 50)).as("toks"))
      graft.operators.ExactSpans.spansFromTokens(
          base.unionByName(clones), "doc_id", "toks", minLen = 16)
        .orderBy(col("id_a"), col("id_b"), col("start_a"),
          col("start_b"))
    }),

    // keep-first EXACT-span removal over the same planted corpus:
    // each reported span is cut from its pair's LATER doc only, so
    // one canonical copy survives; the md5 of every reassembled text
    // must match the oracle's join-based reconstruction token for
    // token — boundary-exact removal, not chunk-grid approximation.
    "dedup_spans_removal" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"),
          slice(split(col("text"), " "), 1, 60).as("toks"))
      val clones = base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(array(lit("px"), lit("qx"), lit("rx")),
          slice(col("toks"), 1, 50)).as("toks"))
      graft.operators.ExactSpans.removeSpans(
          base.unionByName(clones), "doc_id", "toks", minLen = 16)
        .orderBy(col("doc_id"))
    }),

    // deterministic WEIGHTED sampling: per-doc keep probability
    // n_tokens/256 (capped at 1), decided by comparing the doc's
    // md5-fraction against a per-doc hex threshold — importance
    // sampling with zero rand() and zero coordination, the upweighting
    // move for long documents in a training mix. Fixed-width lowercase
    // hex strings compare exactly like the 32-bit integers they encode
    // in both engines.
    "sample_weighted" -> ((s, dir) => {
      val nTokens = TextFunctions.tokenCount(col("text")).cast("long")
      val u = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8)
      val threshold = lpad(lower(hex(
        least(nTokens * lit(16777216L), lit(4294967295L)))), 8, "0")
      Tables.documents(s, dir)
        .withColumn("n_tokens", nTokens)
        .withColumn("kept", u < threshold)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L))
            .as("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // deterministic per-group sampling: keep the k=5 docs per language
    // whose seeded md5 key ranks lowest — reproducible group-balanced
    // subsetting (vs sample_stratified's global keep-rate). Per-group
    // sort is bounded by group size; at billions of docs per language,
    // cut first by an md5-prefix pre-filter (sample_stratified's
    // trick) so the window only ranks survivors.
    "sample_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val key = md5(concat(lit("s7:"), col("doc_id").cast("string"))
        .cast("binary"))
      val w = Window.partitionBy(col("lang")).orderBy(col("k"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), key.as("k"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // deterministic global corpus shuffle: training-data ordering as
    // rank over a seeded md5 key — reproducible across engines, runs,
    // and partitionings (no rand()). The rank is a DISTRIBUTED prefix
    // count, not one global window: docs shard by the first hex digit
    // of the key (a prefix of the order key, so shard order aligns
    // with global order), each shard ranks locally in parallel, and
    // the 16 per-shard counts broadcast back as offsets. A single
    // Window.orderBy would funnel the whole corpus through one
    // partition's sort — the classic global-row_number scale trap.
    "shuffle_deterministic" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val key = md5(concat(lit("epoch1:"), col("doc_id").cast("string"))
        .cast("binary"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), key.as("k"))
        .withColumn("shard", substring(col("k"), 1, 1))
      val localW = Window.partitionBy(col("shard"))
        .orderBy(col("k"), col("doc_id"))
      val local = docs.withColumn("local_rn",
        row_number().over(localW).cast("long"))
      val offsetW = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"))
        .withColumn("offset", coalesce(sum(col("n")).over(offsetW), lit(0L)))
        .select(col("shard"), col("offset"))
      local.join(broadcast(offsets), Seq("shard"))
        .select(col("doc_id"),
          (col("offset") + col("local_rn")).as("shuffle_pos"))
        .orderBy(col("shuffle_pos"))
    }),

    // int8 symmetric embedding quantization: per-vector scale =
    // 127/max|x|, quantized values, reconstruction error. Narrow
    // per-row array math — no shuffle; the compression pass before
    // ANN indexing at scale. Computed by the native QuantizeExpr
    // kernel (one fused primitive loop in codegen) — the equivalent
    // transform/zip_with/filter form evaluates its lambdas
    // interpreted and re-walks the array once per output column;
    // QuantizeExprSpec pins the two bit-identical.
    "embed_quantize" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .withColumn("qs",
          graft.functions.QuantizeExpr.quantizeStats(col("embedding")))
        .select(col("vec_id"),
          col("qs.n_dims").as("n_dims"),
          col("qs.scale").as("scale"),
          col("qs.n_zero").as("n_zero"),
          col("qs.max_abs_err").as("max_abs_err"))
        .orderBy(col("vec_id"))
    }),
  )

  private val stopListSql =
    TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")

  private val docsParquet =
    "read_parquet('/root/testdata/sf0.01/documents.parquet')"
  private val embParquet =
    "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"

  /** Exact n-gram contamination reconciliation — shared verbatim by
    * decontaminate_ngram (broadcast exact set) and decontaminate_bloom
    * (bloom prefilter + exact verify): both implementations must hash
    * to this one ground truth.
    */
  private lazy val decontaminateExactOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM $docsParquet),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 8 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 6), i ->
      |        array_to_string(toks[i:i+7], ' ')))
      |    ELSE []::VARCHAR[] END AS grams
      |  FROM d),
      |eg AS (
      |  SELECT DISTINCT unnest(grams) AS ngram
      |  FROM g WHERE doc_id % 20 = 0),
      |t AS (
      |  SELECT doc_id, grams, CAST(len(grams) AS INT) AS n_ngrams
      |  FROM g WHERE doc_id % 20 <> 0),
      |m AS (
      |  SELECT tt.doc_id, count(*) AS n_matched
      |  FROM (SELECT doc_id, unnest(grams) AS ngram FROM t) tt
      |  JOIN eg USING (ngram)
      |  GROUP BY tt.doc_id)
      |SELECT t.doc_id, n_ngrams,
      |  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
      |  CASE WHEN n_ngrams > 0
      |    THEN CAST(coalesce(m.n_matched, 0) AS DOUBLE) / n_ngrams
      |    ELSE 0.0 END AS contamination_ratio,
      |  (CASE WHEN n_ngrams > 0
      |    THEN CAST(coalesce(m.n_matched, 0) AS DOUBLE) / n_ngrams
      |    ELSE 0.0 END) >= 0.2 AS contaminated
      |FROM t LEFT JOIN m ON t.doc_id = m.doc_id
      |ORDER BY t.doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_pii_scrub" ->
      s"""WITH synth AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com or call 555-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        |    ' from 10.0.' || (doc_id % 255)::VARCHAR || '.7' AS s
        |  FROM $docsParquet)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s, '$EmailRe')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(s, '$PhoneRe')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(s, '$IpRe')) AS INT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |    '$EmailRe', '<EMAIL>', 'g'),
        |    '$IpRe', '<IP>', 'g'),
        |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
        |FROM synth ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM $docsParquet),
        |tg AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1), i ->
        |        toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |    ELSE []::VARCHAR[] END AS tgs
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |    AS distinct_token_ratio,
        |  CASE WHEN len(tgs) > 0
        |    THEN 1.0 - CAST(len(list_distinct(tgs)) AS DOUBLE) / len(tgs)
        |    ELSE 0.0 END AS dup_trigram_ratio,
        |  (CASE WHEN len(tgs) > 0
        |    THEN 1.0 - CAST(len(list_distinct(tgs)) AS DOUBLE) / len(tgs)
        |    ELSE 0.0 END) > 0.1 AS is_repetitive
        |FROM tg ORDER BY doc_id""".stripMargin,

    "text_quality_flags" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM $docsParquet),
        |tg AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1), i ->
        |        toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |    ELSE []::VARCHAR[] END AS tgs
        |  FROM t),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS INT) AS n_tokens,
        |    CAST(len(list_filter(toks, w -> w IN ($stopListSql)))
        |      AS DOUBLE) / len(toks) AS stop_ratio,
        |    CASE WHEN len(tgs) > 0
        |      THEN 1.0 - CAST(len(list_distinct(tgs)) AS DOUBLE) / len(tgs)
        |      ELSE 0.0 END AS dup_trigram_ratio
        |  FROM tg)
        |SELECT doc_id, n_tokens, stop_ratio, dup_trigram_ratio,
        |  n_tokens < 16 AS flag_short,
        |  dup_trigram_ratio > 0.1 AS flag_repetitive,
        |  stop_ratio < 0.01 AS flag_lowstop,
        |  NOT (n_tokens < 16) AND NOT (dup_trigram_ratio > 0.1)
        |    AND NOT (stop_ratio < 0.01) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_tfidf_top" ->
      s"""WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM $docsParquet),
        |tfc AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
        |dfc AS (
        |  SELECT term, count(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM $docsParquet)
        |SELECT tfc.term, tfc.doc_id, tf, df,
        |  CAST(tf * ((1000 * n_docs) // df) AS BIGINT) AS tfidf_scaled
        |FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n
        |ORDER BY tfidf_scaled DESC, tfc.term, tfc.doc_id LIMIT 20""".stripMargin,

    "incremental_stats" ->
      s"""WITH t AS (
        |  SELECT lang, n_chars::BIGINT AS v FROM $docsParquet),
        |s AS (
        |  SELECT lang, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum,
        |    min(v) AS min, max(v) AS max,
        |    CAST(sum(v * v) AS BIGINT) AS sumsq
        |  FROM t GROUP BY lang)
        |SELECT lang, n, sum, min, max, sumsq,
        |  CAST(sum AS DOUBLE) / n AS mean,
        |  CAST(sumsq AS DOUBLE) / n
        |    - (CAST(sum AS DOUBLE) / n) * (CAST(sum AS DOUBLE) / n)
        |    AS variance
        |FROM s ORDER BY lang""".stripMargin,

    "dedup_spans" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM $docsParquet),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 16 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 14, 8),
        |        i -> array_to_string(toks[i:i+15], ' ')))
        |    ELSE []::VARCHAR[] END AS spans
        |  FROM d),
        |e AS (SELECT doc_id, unnest(spans) AS span FROM g),
        |c AS (SELECT span, count(*) AS n_docs FROM e GROUP BY span),
        |m AS (
        |  SELECT e.doc_id, count(*) AS n_dup
        |  FROM e JOIN c USING (span) WHERE c.n_docs >= 2
        |  GROUP BY e.doc_id)
        |SELECT g.doc_id, CAST(len(spans) AS INT) AS n_spans,
        |  CAST(coalesce(m.n_dup, 0) AS BIGINT) AS n_dup_spans,
        |  CASE WHEN len(spans) > 0
        |    THEN CAST(coalesce(m.n_dup, 0) AS DOUBLE) / len(spans)
        |    ELSE 0.0 END AS dup_ratio
        |FROM g LEFT JOIN m USING (doc_id) ORDER BY g.doc_id""".stripMargin,

    // ground truth without hashes: every-position 16-grams, pairs on
    // gram equality, maximal runs = gaps-and-islands per (pair,
    // diagonal) — span_len = run length + 15
    "dedup_spans_exact" ->
      s"""WITH d0 AS (
        |  SELECT doc_id, string_split(text, ' ')[1:60] AS toks
        |  FROM $docsParquet WHERE doc_id % 11 = 0),
        |d AS (
        |  SELECT doc_id, toks FROM d0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    list_concat(['px','qx','rx'], toks[1:50]) FROM d0),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(toks[i:i+15], ' ') AS gram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, len(toks) - 14)) AS i
        |        FROM d WHERE len(toks) >= 16)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.pos AS pa, b.pos AS pb
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |q AS (
        |  SELECT id_a, id_b, pa, pb, pa - pb AS diag,
        |    pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
        |      ORDER BY pa) AS grp
        |  FROM p)
        |SELECT id_a, id_b,
        |  CAST(min(pa) AS INT) AS start_a, CAST(min(pb) AS INT) AS start_b,
        |  CAST(max(pa) - min(pa) + 16 AS INT) AS span_len
        |FROM q GROUP BY id_a, id_b, diag, grp
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin,

    // ground truth removal: islands spans -> covered (doc, pos) on the
    // id_b side -> anti-join token positions -> ordered reassembly
    "dedup_spans_removal" ->
      s"""WITH d0 AS (
        |  SELECT doc_id, string_split(text, ' ')[1:60] AS toks
        |  FROM $docsParquet WHERE doc_id % 11 = 0),
        |d AS (
        |  SELECT doc_id, toks FROM d0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    list_concat(['px','qx','rx'], toks[1:50]) FROM d0),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(toks[i:i+15], ' ') AS gram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, len(toks) - 14)) AS i
        |        FROM d WHERE len(toks) >= 16)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.pos AS pa, b.pos AS pb
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |q AS (
        |  SELECT id_a, id_b, pa, pb, pa - pb AS diag,
        |    pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
        |      ORDER BY pa) AS grp
        |  FROM p),
        |r AS (
        |  SELECT id_b, min(pb) AS start_b,
        |    max(pa) - min(pa) + 16 AS span_len
        |  FROM q GROUP BY id_a, id_b, diag, grp),
        |cov AS (
        |  SELECT DISTINCT id_b AS doc_id, pos FROM (
        |    SELECT id_b, unnest(range(start_b, start_b + span_len)) AS pos
        |    FROM r)),
        |tokpos AS (
        |  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM d)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.tok
        |  FROM tokpos t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
        |  CAST(len(d.toks) - coalesce(agg.n_kept, 0) AS BIGINT)
        |    AS n_removed,
        |  coalesce(agg.fp, md5('')) AS clean_fp
        |FROM d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "sample_weighted" ->
      s"""WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    substr(md5(doc_id::VARCHAR), 1, 8) AS u,
        |    lpad(lower(to_hex(least(
        |      CAST(len(string_split(text, ' ')) AS BIGINT) * 16777216,
        |      4294967295))), 8, '0') AS threshold
        |  FROM $docsParquet)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN u < threshold THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN u < threshold THEN n_tokens ELSE 0 END)
        |    AS BIGINT) AS kept_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "split_train_val_test" ->
      s"""WITH t AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cc'
        |      THEN 'train'
        |      WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM $docsParquet)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM t GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "sample_per_group" ->
      s"""SELECT lang, doc_id, rk FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('s7:' || doc_id::VARCHAR), doc_id) AS INT)
        |      AS rk
        |  FROM $docsParquet)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "shuffle_deterministic" ->
      s"""SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY md5('epoch1:' || doc_id::VARCHAR), doc_id)
        |    AS shuffle_pos
        |FROM $docsParquet ORDER BY shuffle_pos""".stripMargin,

    "sample_stratified" ->
      s"""SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '28'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  min(CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '28'
        |    THEN doc_id END) AS first_sampled_id
        |FROM $docsParquet GROUP BY lang ORDER BY lang""".stripMargin,

    "chunk_documents" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM $docsParquet),
        |st AS (
        |  SELECT doc_id, n_tokens,
        |    unnest(range(0, greatest(n_tokens::BIGINT, 1), 96))
        |      AS chunk_start
        |  FROM t)
        |SELECT doc_id,
        |  CAST(chunk_start // 96 AS INT) AS chunk_idx,
        |  CAST(chunk_start AS BIGINT) AS chunk_start,
        |  CAST(least(128, n_tokens - chunk_start) AS BIGINT) AS chunk_len
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "mix_by_source" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM $docsParquet),
        |c AS (
        |  SELECT source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN cum_tokens <= 4000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_selected,
        |  CAST(sum(CASE WHEN cum_tokens <= 4000 THEN n_tokens ELSE 0 END)
        |    AS BIGINT) AS selected_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "pack_assemble" ->
      s"""WITH toks AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    doc_id % 8 AS shard
        |  FROM $docsParquet),
        |packed AS (
        |  SELECT doc_id, text, n_tokens, shard,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS BIGINT) AS seq_offset
        |  FROM toks)
        |SELECT CAST(shard * 1000000 + seq_offset // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  md5(string_agg(text, '<|eod|>' ORDER BY doc_id)) AS packed_md5
        |FROM packed GROUP BY seq_id ORDER BY seq_id""".stripMargin,

    "decontaminate_ngram" -> decontaminateExactOracle,

    "embed_quantize" ->
      s"""WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
        |      AS absmax
        |  FROM $embParquet),
        |sc AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN absmax > 0 THEN 127.0 / absmax ELSE 0.0 END AS scale
        |  FROM s),
        |q AS (
        |  SELECT vec_id, embedding, scale,
        |    list_transform(embedding, x ->
        |      CAST(round(x::DOUBLE * scale) AS INT)) AS qv
        |  FROM sc)
        |SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS n_dims,
        |  scale,
        |  CAST(len(list_filter(qv, v -> v = 0)) AS INT) AS n_zero,
        |  CASE WHEN scale > 0 THEN
        |    list_max(list_transform(range(1, len(embedding) + 1), i ->
        |      abs(embedding[i]::DOUBLE - qv[i]::DOUBLE / scale)))
        |  ELSE 0.0 END AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // every literal ::DOUBLE — bare decimal literals are DECIMAL in
    // DuckDB and would silently switch the arithmetic off the IEEE
    // path Spark computes
    "text_bm25_topk" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM $docsParquet),
        |s AS (
        |  SELECT count(*) AS n_docs,
        |    CAST(SUM(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM d),
        |t AS (
        |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
        |tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM t
        |  WHERE term IN ('spark','query','hash') GROUP BY 1, 2, 3),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(floor((tf * 2.2::DOUBLE
        |        / (tf + 1.2::DOUBLE * (0.25::DOUBLE
        |          + 0.75::DOUBLE * dl / avgdl)))
        |      * 1000000.0::DOUBLE) AS BIGINT)
        |      * ((1000 * n_docs) // df) AS contrib
        |  FROM tf JOIN dfc USING (term) CROSS JOIN s)
        |SELECT doc_id, count(*) AS n_terms_matched,
        |  CAST(SUM(contrib) AS BIGINT) AS bm25_scaled
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25_scaled DESC, doc_id LIMIT 15""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM $docsParquet),
        |b AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
        |  FROM t),
        |occ AS (
        |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS occ
        |  FROM b GROUP BY doc_id, bg.w1, bg.w2),
        |c12 AS (SELECT w1, w2, CAST(SUM(occ) AS BIGINT) AS cnt12
        |  FROM occ GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(occ) AS BIGINT) AS cnt1
        |  FROM occ GROUP BY w1),
        |v AS (SELECT count(DISTINCT term) AS v_size
        |  FROM (SELECT unnest(toks) AS term FROM t)),
        |s AS (
        |  SELECT doc_id, occ,
        |    (1000000000 * (cnt12 + 1)) // (cnt1 + v_size) AS lik_ppb
        |  FROM occ JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(occ * lik_ppb) AS BIGINT) AS lm_sum,
        |  CAST(SUM(occ * lik_ppb) AS BIGINT)
        |    // CAST(SUM(occ) AS BIGINT) AS lm_mean_ppb
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "curate_span_removal" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM $docsParquet),
        |c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(0, (len(toks) - 1) // 16),
        |      i -> struct_pack(idx := i,
        |        chunk := array_to_string(toks[i * 16 + 1 : i * 16 + 16],
        |          ' ')))) AS ch
        |  FROM t),
        |cc AS (SELECT doc_id, ch.idx AS chunk_idx, ch.chunk AS chunk FROM c),
        |dup AS (SELECT chunk FROM cc GROUP BY chunk
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (SELECT * FROM cc
        |  WHERE chunk NOT IN (SELECT chunk FROM dup)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept_chunks,
        |    string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, (len(toks) - 1) // 16 + 1 AS n_chunks FROM t)
        |SELECT tot.doc_id, tot.n_chunks,
        |  coalesce(agg.n_kept_chunks, 0) AS n_kept_chunks,
        |  md5(coalesce(agg.clean_text, '')) AS clean_md5
        |FROM tot LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "sample_dsir_weights" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM $docsParquet),
        |f AS (
        |  SELECT doc_id, source,
        |    unnest(toks || list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS feat
        |  FROM t),
        |o AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096 AS bucket,
        |    count(*) AS occ
        |  FROM f GROUP BY doc_id, source,
        |    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096),
        |m AS (
        |  SELECT bucket, CAST(SUM(occ) AS BIGINT) AS cnt_s,
        |    CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3')
        |      THEN occ ELSE 0 END) AS BIGINT) AS cnt_t
        |  FROM o GROUP BY bucket),
        |tt AS (SELECT CAST(SUM(cnt_s) AS BIGINT) AS tot_s,
        |  CAST(SUM(cnt_t) AS BIGINT) AS tot_t FROM m),
        |r AS (
        |  SELECT bucket,
        |    (1000000 * (cnt_t + 1) * (tot_s + 4096))
        |      // ((cnt_s + 1) * (tot_t + 4096)) AS ratio_ppm
        |  FROM m CROSS JOIN tt),
        |sc AS (SELECT doc_id, occ, ratio_ppm FROM o JOIN r USING (bucket))
        |SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_feats,
        |  CAST(SUM(occ * ratio_ppm) AS BIGINT) AS dsir_sum,
        |  CAST(SUM(occ * ratio_ppm) AS BIGINT)
        |    // CAST(SUM(occ) AS BIGINT) AS dsir_mean_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_rarity_score" ->
      s"""WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM $docsParquet),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |n AS (SELECT count(*) AS n_total FROM t),
        |s AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(SUM((1000000 * n_total) // cnt) AS BIGINT) AS rarity_sum
        |  FROM t JOIN c USING (term) CROSS JOIN n GROUP BY doc_id)
        |SELECT doc_id, n_tokens, rarity_sum // n_tokens AS rarity_scaled
        |FROM s ORDER BY rarity_scaled DESC, doc_id LIMIT 20""".stripMargin,
  ) ++ Map(
    // the bloom path must produce the EXACT formulation's rows —
    // decontaminate_bloom shares decontaminate_ngram's oracle verbatim
    "decontaminate_bloom" -> decontaminateExactOracle)
}
