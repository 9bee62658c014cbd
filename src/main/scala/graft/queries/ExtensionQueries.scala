package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Dedup, Ivf, Similarity}
import graft.sources.Multimodal

/** Training-data-pipeline operator queries. Most started rows-only
  * and were later oracled as the cross-engine technique emerged:
  * curation_pipeline via recursive-CTE clustering, dedup_minhash_lsh
  * via the aggressive-recall banding dial, multimodal_features and
  * text_rolling_fp via DuckDB list-lambda folds, dedup_simhash via an
  * md5-derived token-hash basis, ann_lsh_topk via plane-literal SQL
  * (multi-probe ≡ hamming ≤ 1), and ann_ivf_topk by replaying the
  * deterministic Lloyd training in SQL (oracles live in TextQueries /
  * EmbeddingQueries). Only TWO entries remain rows-only — engine
  * sketches (agg_sketches) and the rand()-seeded generator
  * (cdc_seeder) — each exactness-covered by ScalaTest specs instead
  * (SeederSpec determinism/shape; sketch bounds in suite).
  *
  * The synthetic documents corpus is mutually similar by construction
  * (shared vocabulary), which is the LSH worst case — so the LSH
  * queries run on a bounded id-slice to keep candidate sets sane in
  * bench; the operators themselves are corpus-size-agnostic.
  */
object ExtensionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash+LSH near-dedup: banded signatures → bucket join →
    // exact-Jaccard verification
    "dedup_minhash_lsh" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
      // ngram = 1 (bag-of-words space): the synthetic corpus's
      // duplicates share vocabulary, not phrase order, so unigram
      // MinHash is the space where its near-dups actually live.
      // 32 bands × 2 rows is the aggressive-recall dial for t≈0.8
      // (banding threshold (1/b)^(1/r) ≈ 0.18): a ≥0.8 pair is missed
      // with probability ~6e-15, so the result equals brute force and
      // is oracled against it (TextQueries.oracle)
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8,
          bands = 32, ngram = 1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash near-dup via pigeonhole chunk banding
    // SimHash near-dedup over md5-derived 60-bit token hashes: the
    // kernel/banding are hash-agnostic, and md5 is computable in both
    // engines, which makes this query oracle-exact (pigeonhole
    // banding at maxBits=3 has recall 1, so the banded result IS the
    // brute-force ground truth). The xxhash64 default stays the
    // production path (`Dedup.simhashNearDups`, spec-covered).
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .repartition(col("doc_id"))
        .withColumn("th",
          transform(graft.functions.TextFunctions.tokens(col("text")),
            t => conv(substring(md5(t.cast("binary")), 1, 15), 16, 10)
              .cast("long")))
      Dedup.simhashNearDupsFromHashes(docs, "doc_id", "th", maxBits = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // multi-probe random-hyperplane LSH ANN
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // embedding near-dup over the UNBOUNDED pair space via hyperplane
    // bucketing: only same-bucket pairs get an exact cosine (the
    // window-bounded oracle-checked variant is embed_neardup_pairs)
    "embed_neardup_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"),
          Similarity.signature(col("embedding"), numPlanes = 10).as("bucket"))
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
        col("bucket"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
        col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", graft.functions.CosineSimilarityExpr
          .cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"))
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IVF ANN: k-means inverted lists, nprobe-bounded exact search
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // nlist=8 / nprobe=4 — the configuration IvfTopKSpec recall-tests;
      // iters = 1: extra Lloyd rounds buy no measurable recall on this
      // corpus but add a full assignment+average scan each
      Ivf.ivfTopK(emb.filter(col("vec_id") < 5), emb, k = 5,
        nlist = 8, nprobe = 4, iters = 1)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF×PQ — the composed billion-vector ANN stack (Pq.ivfPqTopK,
    // the production shortlist+re-rank shape): the SAME coarse
    // quantizer as ann_ivf_topk prunes to nprobe lists, candidates
    // shortlist by ADC over the SAME init-only codebooks as
    // ann_pq_adc (m lookups each, no raw vector in the scanned
    // index), then ONLY the shortlist's raw vectors re-rank by exact
    // L2. Every stage is deterministic, so the oracle composes the
    // two proven replays (Lloyd CTEs + encode/LUT CTEs), restricts
    // ADC to the probed lists, and replays the exact re-rank.
    "ann_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val coarse = Ivf.train(emb, nlist = 8, iters = 1)
      val cbs = graft.operators.Pq.train(emb, dim = 64, m = 8, k = 16,
        iters = 0)
      graft.operators.Pq.ivfPqTopK(emb.filter(col("vec_id") < 5), emb,
          dim = 64, coarse, cbs, k = 5, nprobe = 4, shortlist = 50)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // the composed curation pipeline (lang filter -> quality gate ->
    // exact dedup -> LSH near-dedup clustering -> stats)
    "curation_pipeline" -> ((s, dir) => {
      // bounded id-slice: the synthetic corpus is mutually similar, so
      // cluster-dedup over all of it is the LSH worst case (see object
      // scaladoc); the pipeline itself is corpus-size-agnostic.
      // unigram space at threshold 0.9: the corpus's near-dups are
      // vocabulary-level (word-shuffles), so bag-of-words MinHash is
      // the space where they live — and the verified pair graph is
      // nonempty, so the clustering stage runs real work in the timed
      // path. Oracled: TextQueries.curationOracle reproduces every
      // stage with brute-force pairs + recursive-CTE clustering
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), col("lang"))
      Curation.curate(docs, Curation.Config(
          keepLangs = Set("en"), minTokens = 5, nearDupThreshold = 0.9,
          nearDupNgram = 1))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // the FineWeb-style heuristics → model → dedup funnel as ONE call
    // (r12): same pipeline with Config.modelGate armed — the fixed
    // literal-weight logit (quality_model_score's model) gates between
    // the heuristic filters and dedup, riding the same scan as a
    // codegen'd Column. Oracled: the curation_pipeline oracle with
    // the identical left-associated IEEE logit as an extra CTE.
    "curation_model_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), col("lang"))
      val model = graft.operators.QualityModel.Model(
        bias = -2.5, weights = Seq(2.0, 8.0, 10.0, 1.0))
      Curation.curate(docs, Curation.Config(
          keepLangs = Set("en"), minTokens = 5, nearDupThreshold = 0.9,
          nearDupNgram = 1, modelGate = Some((model, 0.0))))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // sketch aggregates: HLL distinct + approximate quantiles.
    // INTENTIONALLY rows-only (no oracleSql entry, by design, not
    // omission): the values are Spark's engine-native HLL++/KLL sketch
    // states, which no other engine reproduces bit-for-bit — DuckDB's
    // approx_count_distinct is a DIFFERENT estimator, so a hash
    // comparison would fail on two correct answers. The deterministic
    // accuracy story lives elsewhere: agg_distinct oracle-checks the
    // exact counterparts, and agg_hll_registers / agg_cms_counters /
    // agg_kmv_bottomk oracle-check this engine's own deterministic
    // sketch implementations register-by-register.
    "agg_sketches" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("median_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
          .as("p99_price"))
    }),

    // Karp-Rabin rolling-hash winnowing fingerprints. Oracled: the
    // native kernel's window hashes are reproduced in DuckDB with
    // nested list lambdas (TextQueries.oracle)
    "text_rolling_fp" -> ((s, dir) => {
      // native codegen'd expression (RollingHashExpr): one primitive
      // loop per row; bit-identical to the declarative charCodes +
      // rollingHashFromCodes form (RollingHashExprSpec)
      Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.RollingHashExpr.rollingFp(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_hashes"),
          element_at(col("fp"), 1).as("min_hash"))
        .orderBy(col("doc_id"))
    }),

    // deterministic distributed seeder (SURVEY §2 rows 5, 26-28)
    "cdc_seeder" -> ((s, _) => {
      graft.cdc.Seeder
        .users(s, 1000, java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))
        .groupBy(col("is_deleted"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("email")).as("n_emails"))
        .orderBy(col("is_deleted"))
    }),

    // multimodal decode plumbing: binary payloads → mapPartitions
    // feature extraction (stubbed codec, real batching/schema). Oracled:
    // the stub's rolling checksum is reproduced in DuckDB HUGEINT
    // arithmetic (TextQueries.oracle)
    "multimodal_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, s"$dir/documents.parquet")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"))
        .orderBy(col("media_id"))
    }),

    // REAL image decode + perceptual dedup end-to-end: render actual
    // PNGs (JDK ImageIO) whose 9×8 luminance grid encodes
    // md5(doc_id % 97), decode them back, fingerprint with dHash
    // (block-average 9×8 → 64 horizontal-gradient sign bits), and
    // group. Members of a group render at DIFFERENT pixel sizes, so
    // matching them is true scale-invariant perceptual dedup, not
    // byte equality — yet the expected group structure (and the sum
    // of DECODED widths/heights, proving the codec reads real
    // dimensions) is pure doc_id arithmetic the oracle recomputes
    // without decoding a byte. The near-dup JOIN over these
    // fingerprints (banded hamming, shared with SimHash) is pinned in
    // MultimodalImageSpec with planted bit-flips.
    "multimodal_phash" -> ((s, dir) => {
      val media = Multimodal.syntheticImages(s, s"$dir/documents.parquet")
      // one aggregation tree: per-fingerprint members + dimension
      // sums, then a global rollup — no second pass over the decoded
      // corpus and no join
      Multimodal.imageDHashes(media)
        .groupBy(col("dhash"))
        .agg(count(lit(1)).as("members"),
          sum(col("width")).as("gw"), sum(col("height")).as("gh"))
        .agg(
          sum(col("members")).as("n_images"),
          count(lit(1)).as("n_groups"),
          (sum(col("members") * (col("members") - 1)) / lit(2))
            .cast("bigint").as("n_pairs"),
          sum(col("gw")).cast("bigint").as("sum_w"),
          sum(col("gh")).cast("bigint").as("sum_h"))
    }),

    // frame-level video near-dedup: every frame in the container is a
    // REAL PNG decoded with the real JDK codec; members of a
    // perceptual group render the same 12-frame sequence at different
    // pixel sizes AND with a clipped prefix (temporal offset), so a
    // pair's shared-frame vote is 12 − max(clipA, clipB) — pure
    // doc_id arithmetic for the oracle, while the engine side must
    // demux, decode and fingerprint every frame to get there.
    "multimodal_video" -> ((s, dir) => {
      val media = Multimodal.syntheticVideos(s, s"$dir/documents.parquet",
        sampleMod = 11L, nGroups = 7L)
      Multimodal.videoNearDups(media, minSharedFrames = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the same frame-voting pipeline over REAL RIFF/AVI containers:
    // the engine demuxes a genuine public container (fourcc chunk
    // walk, LIST recursion, uncompressed-DIB frames wrapped as BMP
    // for the JDK decoder — sources/Avi.scala) before fingerprinting;
    // the oracle stays the pure doc_id arithmetic, so a green row
    // proves the demuxer end-to-end, not just the vote.
    "multimodal_video_avi" -> ((s, dir) => {
      val media = Multimodal.syntheticVideosAvi(s,
        s"$dir/documents.parquet", sampleMod = 13L, nGroups = 5L)
      Multimodal.videoNearDups(media, minSharedFrames = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // REAL audio decode end-to-end: synthesize actual WAV containers
    // (16-bit mono PCM square waves whose period/length/amplitude are
    // doc_id arithmetic), decode them back with the JDK's own parser
    // (javax.sound.sampled), and report exact integer sample stats —
    // n_samples, duration, energy, zero crossings, peak — all
    // closed-form for the oracle. A green row proves WAV header +
    // PCM frame parsing, not bookkeeping.
    "multimodal_audio" -> ((s, dir) => {
      val media = Multimodal.syntheticWavs(s, s"$dir/documents.parquet")
      Multimodal.audioStats(media).orderBy(col("media_id"))
    }),

    // REAL resize pipeline: decode → bilinear scale into the
    // aspect-preserving 48px box → re-encode PNG → decode AGAIN and
    // report the second decode's dimensions. A green row proves the
    // full codec round-trip (not metadata bookkeeping): the oracle
    // recomputes the box from the construction formula alone.
    "multimodal_resize" -> ((s, dir) => {
      val media = Multimodal.syntheticImages(s, s"$dir/documents.parquet")
      val resized = Multimodal.resizeImages(media, maxSide = 48)
      Multimodal.imageDHashes(resized)
        .select(col("media_id"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }),
  )
}
