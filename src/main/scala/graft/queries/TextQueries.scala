package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Text-analysis operators for the training-data pipeline (builder
  * brief: language-ID, quality scoring, token counting, fingerprinting,
  * exact + n-gram dedup) over the `documents` table, each with a DuckDB
  * oracle where SQL-expressible.
  *
  * All ops are pure Column expressions — codegen'd, no UDFs — so at
  * 100 TB they run embarrassingly parallel over document partitions with
  * zero shuffle except the final aggregates.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact heavy-hitter tokens through the Misra-Gries sketch
    // (operators.HeavyHitters): pass 1 = capacity-255 mergeable MG
    // udaf (each map task ships 255 entries, never the vocabulary),
    // whose survivors provably include every token above n/256; pass 2
    // counts ONLY those candidates exactly (broadcast semi-join). The
    // n/64 threshold sits inside the guarantee, so the output is
    // exact — the plain GROUP BY/HAVING oracle checks the sketch's
    // superset property along with the counts.
    "text_heavy_hitters" -> ((s, dir) => {
      val tok = Tables.documents(s, dir).repartition(col("doc_id"))
        .select(explode(split(col("text"), " ")).as("term"))
      graft.operators.HeavyHitters
        .exactHeavyHitters(tok, "term", m = 255, denom = 64)
        .orderBy(col("cnt").desc, col("term"))
    }),

    // token counting + basic stats (whitespace tokenizer)
    "text_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("len_chars"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.distinctTokenCount(col("text")).as("n_distinct_tokens"))
        .orderBy(col("doc_id"))
    }),

    // model-based quality filtering (operators.QualityModel — the
    // FineWeb-Edu-style classifier tier): the logit of a FIXED linear
    // model over the engine's quality features, integer-scaled
    // (floor(logit·1e6)) so the per-row IEEE arithmetic — no exp/log —
    // compares bit-for-bit against DuckDB. The literal weights stand
    // in for QualityModel.train's output (training reduces floats
    // across partitions, so the trained model is spec-tested, not
    // oracled); the expression shape IS QualityModel.scoreScaled's.
    "quality_model_score" -> ((s, dir) => {
      val model = graft.operators.QualityModel.Model(
        bias = -2.5, weights = Seq(2.0, 8.0, 10.0, 1.0))
      Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"),
          graft.operators.QualityModel.scoreScaled(model)(col("text"))
            .as("logit_scaled"),
          (graft.operators.QualityModel.score(model)(col("text")) >
            lit(0.0)).as("kept"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring: punctuation ratio, stopword ratio, mean word len
    "text_quality" -> ((s, dir) => {
      // repartition: spread regexp+tokenize cost across cores (the
      // table arrives as one small file = one task otherwise)
      Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.punctCount(col("text")).as("n_punct"),
          TextFunctions.stopwordCount(col("text")).as("n_stop"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // n-gram language-ID heuristic: score = count of language-marker
    // tokens; predicted language = argmax with deterministic tiebreak
    "text_langid" -> ((s, dir) => {
      TextFunctions.withLangScores(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), col("predicted_lang"))
        .orderBy(col("doc_id"))
    }),

    // exact-dup fingerprint: md5 of normalized text (identical digest
    // algorithm in both engines)
    "text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(TextFunctions.normalize(col("text"))).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // exact dedup via content hash: survivor = min doc_id per digest
    "dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(TextFunctions.normalize(col("text"))).as("fp"))
        .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("survivor_id"))
    }),

    // word-set Jaccard similarity over a bounded candidate window
    // (|id diff| <= 3) — the verifiable slice of near-dedup; the
    // LSH-banded variant for unbounded pairs is graft.operators.Dedup
    "dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.wordSet(col("text")).as("words"))
      // the bounded id-window is a SMALL-RANGE join: explode the window
      // offsets so it becomes an equi-join (hash/SMJ, shuffle on the
      // key) instead of a O(n²) broadcast nested-loop range join
      val a = docs.select(col("doc_id").as("id_a"), col("words").as("wa"))
        .withColumn("id_b", explode(array((1 to 3).map(d => col("id_a") + d): _*)))
      val b = docs.select(col("doc_id").as("id_b"), col("words").as("wb"))
      a.join(b, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("wa"), col("wb"))).cast("double") /
            size(array_union(col("wa"), col("wb")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // doc-in-doc containment (asymmetric near-dup): C(A→B) =
    // |sh(A)∩sh(B)| / |sh(A)| over distinct 5-token shingles — catches
    // a document embedded inside a longer one, which symmetric Jaccard
    // dilutes below any threshold. Plan shape is an inverted-index
    // equi-join on the shingle (O(postings), never O(n²)) with a
    // stop-shingle guard: shingles present in >100 docs are boilerplate
    // and would each contribute a quadratic postings-list join at
    // 100 TB, so they are dropped BEFORE candidate generation (the
    // df-cap is computed with a map-side-combined groupBy, not a
    // window). Integer basis-point containment keeps the compare exact.
    "dedup_containment" -> ((s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), array_distinct(
          transform(sequence(lit(1), size(col("toks")) - 4),
            i => concat_ws(" ", slice(col("toks"), i, lit(5))))).as("sh"))
      // shingles collapse to 60-bit md5 ints BEFORE any shuffle: the
      // postings index, df counts, and pair join all move 8-byte keys
      // instead of ~40-byte strings (measured 7.2s -> string keys were
      // the whole cost at sf0.1). The oracle folds the identical hash,
      // so even a collision (p ~ n²/2^60) stays cross-engine-exact.
      val e0 = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"),
          conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("gh"))
      val df = e0.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      // the filtered postings feed THREE consumers (per-doc sizes and
      // both sides of the pair join): persist once instead of
      // re-tokenizing + re-hashing the corpus per consumer
      val e = e0.join(df, Seq("gh")).filter(col("df") <= 100)
        .select(col("doc_id"), col("gh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val p = e.as("a").join(e.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
      p.join(n, col("id_a") === col("doc_id"))
        .filter(col("shared") * 10 >= col("n_sh") * 6)
        .select(col("id_a"), col("id_b"),
          expr("CAST(shared * 10000 AS BIGINT) DIV n_sh")
            .as("containment_bp"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // array-function surface over the token arrays: sort, slice,
    // membership, set-overlap — narrow per-row collection algebra,
    // reduced to scalars so the cross-engine compare is exact.
    "array_funcs" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, dir)
        .withColumn("toks", toks)
        .select(col("doc_id"),
          size(col("toks")).as("n"),
          element_at(sort_array(col("toks")), 1).as("first_sorted"),
          concat_ws("-", slice(col("toks"), 1, 3)).as("head3"),
          array_contains(col("toks"), "data").as("has_data"),
          arrays_overlap(col("toks"),
            array(lit("table"), lit("stream"))).as("has_table_or_stream"),
          size(array_distinct(col("toks"))).as("n_distinct"))
        .orderBy(col("doc_id"))
    }),

    // corpus-relative gate: drop docs whose token count falls below
    // the corpus 25th percentile — a DYNAMIC threshold (scalar
    // subquery, broadcast as a literal at runtime) instead of a fixed
    // constant, the way production length filters track corpus drift.
    "filter_relative_length" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("n_tokens",
          TextFunctions.tokenCount(col("text")).cast("long"))
      // exact interpolated percentile — bit-identical to DuckDB
      // quantile_cont on integer inputs (see agg_percentiles_exact)
      val p25 = docs.agg(percentile(col("n_tokens"), lit(0.25)).as("p"))
      docs.crossJoin(broadcast(p25))
        .filter(col("n_tokens") >= col("p"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("n_tokens")).as("min_tokens"))
        .orderBy(col("lang"))
    }),

    // corpus length histogram: 16-token buckets with per-bucket doc
    // and token totals — the length-distribution profile a packing or
    // filtering stage consults. One map-side-combined aggregate over
    // however many buckets exist (dozens), regardless of corpus size.
    "text_length_histogram" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("n_tokens",
          TextFunctions.tokenCount(col("text")).cast("long"))
        .groupBy(floor(col("n_tokens") / 16).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("bucket"))
    }),

    // fuzzy dedup via edit distance on BLOCKED candidates: block on
    // (lang, n_chars div 16) with each probe row exploded into its own
    // bucket AND both neighbors. Width-16 buckets make length-changing
    // edits reachable (an exact-length block misses any near-dup whose
    // edit inserts or deletes a character — a recall hole) and cap
    // per-cell candidate growth: cell population tracks the length
    // DISTRIBUTION density, not the raw corpus count the way one row
    // per exact length does. Each unordered pair still joins at most
    // once because the right side sits only in its home bucket.
    // Verification is Levenshtein over a bounded 256-char prefix
    // (O(prefix²) per pair regardless of doc size); report the 25
    // closest pairs. At 100 TB, swap the blocker for the MinHash
    // bander in graft.operators.Dedup — verification stays the same.
    "dedup_edit_distance" -> ((s, dir) =>
      editDistancePairs(Tables.documents(s, dir))
        .orderBy(col("edit_dist"), col("id_a"), col("id_b"))),

    // generator coverage: explode tokens -> corpus term frequencies
    "text_token_freq" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)
    }),

    // sequence packing: shard-parallel concat-and-chunk assignment of
    // docs to fixed token-budget training sequences (integer math)
    "pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing
        .packSequences(docs, "n_tokens", "doc_id", budget = 512, shards = 8)
        .select(col("doc_id"), col("shard"), col("seq_id"), col("seq_offset"))
        .orderBy(col("doc_id"))
    }),

    // multimodal plumbing: opaque binary payload column + typed metadata
    // (byte length computed on the binary, not the string)
    "multimodal_binary" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          TextFunctions.asBinaryPayload(col("text")).as("payload"))
        .select(col("doc_id"), col("source"),
          length(col("payload")).as("payload_bytes"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("payload_bytes")).as("total_bytes"))
        .orderBy(col("source"))
    }),

    // regexp_extract_all surface: per-doc structured extraction with
    // RE2/Java-portable patterns (same portability discipline as
    // text_pii_scrub), reduced to scalars for the exact compare
    "text_regex_extract" -> ((s, dir) => {
      val nums = regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))
      val caps = regexp_extract_all(col("text"),
        lit("[A-Z][a-z]+"), lit(0))
      Tables.documents(s, dir).repartition(col("doc_id"))
        .select(col("doc_id"),
          size(nums).as("n_numbers"),
          coalesce(try_element_at(nums, lit(1)), lit("")).as("first_number"),
          size(caps).as("n_capitalized"),
          coalesce(try_element_at(caps, lit(-1)), lit("")).as("last_capitalized"))
        .orderBy(col("doc_id"))
    }),

    // EXACT all-pairs Jaccard join (recall 1, unlike LSH): prefix
    // filtering on the global df-ascending order — two sets with
    // J >= 9/10 must share an element in their (rarest-first) prefixes,
    // so the inverted-index join on prefix elements generates a
    // candidate superset and the integer inter·denom >= num·union
    // verify keeps exactly the true pairs. Feature space is 60-bit-
    // hashed 5-token shingles, NOT word unigrams: this corpus's
    // template clusters share nearly all WORDS (word-space J >= 0.9 is
    // ~1M quasi-clique pairs at sf0.1 — candidate generation degrades
    // toward O(n²) and the output itself is quadratic), while shingles
    // break at every varied slot (242 pairs at sf0.1). Prefix filtering
    // is exact in ANY feature space; pick the one where similarity is
    // sparse. Hashes are 8-byte join keys (the dedup_containment
    // lesson) and the oracle folds the identical md5 prefix.
    "dedup_allpairs" -> ((s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), array_distinct(
          transform(sequence(lit(1), size(col("toks")) - 4),
            i => concat_ws(" ", slice(col("toks"), i, lit(5))))).as("sh"))
        .select(col("doc_id"),
          transform(col("sh"), g =>
            conv(substring(md5(g.cast("binary")), 1, 15), 16, 10)
              .cast("long")).as("hs"))
      graft.operators.AllPairs
        .jaccardJoin(sh, "doc_id", "hs", num = 9, denom = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // fuzzy record linkage (Jaro-Winkler): match a "dirty" probe list
    // (part names with vowels stripped — a deterministic corruption
    // both engines can derive) back to the clean part table. Classic
    // blocked-linkage shape:
    //  - blocking key = first 4 chars of the consonant skeleton, so
    //    the candidate set is an EQUI-join (shuffle on the block key,
    //    broadcast-able probe side) — never an all-pairs cross join;
    //  - comparator = the native codegen'd jaro_winkler kernel, pinned
    //    bit-for-bit to DuckDB's jaro_winkler_similarity (threshold
    //    margin checked: nearest score sits 7e-4 from 0.84, ~1e12 ulps,
    //    so the predicate cannot flip across engines);
    //  - per-probe winner = groupBy argmax over (sim, -part_id) with
    //    map-side partial aggregation — a k=1 top-k, not a window sort
    //    over the candidate table;
    //  - the comparator runs once per DISTINCT (name, probe) pair, not
    //    once per row pair: real entity corpora are value-skewed (the
    //    10x full-scale bench grew row pairs 100x but distinct names
    //    0x, and this query went 83x slower scoring duplicates), so
    //    names collapse to (name, multiplicity, min id) BEFORE the
    //    block join and the aggregate reconstitutes exact row-level
    //    counts from the multiplicities — identical output, scoring
    //    cost O(distinct names x probes in block).
    // At 100 TB the block key bounds candidate volume and the distinct
    // collapse makes that volume grow with VALUE diversity, not row
    // count; the probe side is the small dim by construction.
    "link_fuzzy_names" -> ((s, dir) => {
      val strip = (c: Column) => regexp_replace(c, "[aeiou]", "")
      val probes = Tables.part(s, dir)
        .filter(col("p_partkey") % 7 === 0)
        .select(col("p_partkey").as("probe_id"),
          strip(col("p_name")).as("probe_name"))
      val candNames = Tables.part(s, dir)
        .select(col("p_partkey").as("part_id"), col("p_name").as("name"),
          substring(strip(col("p_name")), 1, 4).as("blk"))
        .groupBy(col("blk"), col("name"))
        // the original row-level argmax broke sim ties on the LOWEST
        // part id; within one name every dup shares the sim, so the
        // name's min id is the only id that can ever win
        .agg(count(lit(1)).as("n_dups"), min(col("part_id")).as("min_id"))
      candNames
        .join(broadcast(probes),
          substring(col("probe_name"), 1, 4) === col("blk"))
        .withColumn("sim", graft.functions.JaroWinklerExpr
          .jaroWinkler(col("name"), col("probe_name")))
        .filter(col("sim") >= 0.84)
        .groupBy(col("probe_id"))
        .agg(sum(col("n_dups")).as("n_above"),
          max_by(struct(col("min_id").as("part_id"), col("sim")),
            struct(col("sim"), (-col("min_id")).as("neg"))).as("best"))
        .select(col("probe_id"), col("best.part_id").as("match_id"),
          col("best.sim").as("sim"), col("n_above"))
        .orderBy(col("probe_id"))
    }),

    // Unicode canonicalization (functions.UnicodeNormExpr — native
    // NFC, the cleanup pass that must precede hashing/dedup: composed
    // é and e+U+0301 are byte-different, hash-different, and
    // visually identical). The corpus is ASCII, so each doc first
    // gets a DETERMINISTIC denormalized injection — replace the first
    // 'a'/'o' with a decomposed combining sequence (docs ≡ 0, 2 mod
    // 4), the first 'e' with precomposed é (≡ 1: already NFC, must
    // NOT change), the first 't' with Cyrillic т (≡ 3: non-Latin but
    // NFC-stable) — replayed exactly in DuckDB, whose utf8proc
    // nfc_normalize then oracles the JDK normalizer per document:
    // changed flag, codepoint lengths before/after (NFC shrinks the
    // combining cases by one), a Cyrillic-codepoint census, and the
    // normalized head bytes. Narrow per-doc work, zero shuffle.
    "text_unicode_nfc" -> ((s, dir) => {
      def injectFirst(sc: Column, letter: String, repl: String): Column = {
        val p = instr(sc, letter)
        when(p === 0, sc).otherwise(concat(
          sc.substr(lit(1), p - 1), lit(repl),
          sc.substr(p + 1, length(sc))))
      }
      val t = col("text")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            injectFirst(t, "a", "à"))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            injectFirst(t, "e", "é"))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            injectFirst(t, "o", "ö"))
          .otherwise(injectFirst(t, "t", "т")).as("dirty"))
        .withColumn("nfc",
          graft.functions.UnicodeNormExpr.unicodeNorm(col("dirty")))
        .select(col("doc_id"),
          (col("nfc") =!= col("dirty")).as("changed"),
          length(col("dirty")).cast("long").as("len_dirty"),
          length(col("nfc")).cast("long").as("len_nfc"),
          regexp_count(col("nfc"), lit("[\\x{0400}-\\x{04FF}]"))
            .cast("long").as("n_cyr"),
          substring(col("nfc"), 1, 20).as("head20"))
        .orderBy(col("doc_id"))
    }),

    // the SQL front door: the native kernels (jaro_winkler,
    // unicode_norm — GraftExtensions-registered) driven through a
    // plain `spark.sql` string over a temp view, proving a SQL-only
    // user gets the same expression tier as the Column API — same
    // codegen, same plans, oracle-exact against DuckDB's independent
    // jaro_winkler_similarity / nfc_normalize implementations. (The
    // Column-API twins of these kernels are gated by link_fuzzy_names
    // and text_unicode_nfc; this row gates the registration path.)
    "sql_native_funcs" -> ((s, dir) => {
      graft.GraftExtensions.register(s) // extension-less sessions
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      // "cafe" + combining acute U+0301 — a DECOMPOSED accent that
      // unicode_norm must compose; the oracle builds the same bytes
      // via chr(769)
      val dec = "café"
      s.sql(s"""SELECT c_custkey,
        |  jaro_winkler(c_name, 'Customer#000000010') AS jw,
        |  unicode_norm(concat('$dec ', c_name)) AS norm_name
        |FROM customer_v
        |WHERE c_custkey <= 50
        |ORDER BY c_custkey""".stripMargin)
    }),
  )

  /** Blocked edit-distance candidate pairs (the dedup_edit_distance
    * engine): every same-lang pair whose length buckets are equal or
    * adjacent, with the Levenshtein distance of their 256-char
    * prefixes. Needs (doc_id, lang, n_chars, text).
    */
  def editDistancePairs(docs: DataFrame,
      maxDist: Int = 16): DataFrame = {
    // THRESHOLDED near-dup search: emit pairs with prefix edit
    // distance ≤ maxDist. The threshold is what makes the whole
    // operator scale-coherent:
    //  - blocking is provably COMPLETE: bucket width = maxDist with
    //    ±1 probing reaches every pair whose length gap ≤ maxDist,
    //    and a distance ≤ maxDist forces exactly that length gap;
    //  - verification is a banded-Levenshtein kernel, O(len·k) with
    //    early abandon instead of the full O(len²) DP — the un-
    //    thresholded form measured 118 s at sf0.1 because candidate
    //    volume grows quadratically with the corpus and every pair
    //    paid the full 256×256 table.
    // bag-of-letters signature, computed ONCE per doc side: a single
    // edit changes the letter histogram's L1 by at most 2 (a
    // substitution moves two counts by one, an insert/delete moves
    // one), so L1(sig_a, sig_b) > 2·maxDist PROVES edit distance >
    // maxDist — a complete pair prefilter ~10× cheaper than even the
    // early-abandoning banded kernel. The 10× full-scale bench showed
    // why it matters: same-length different-content docs grow
    // quadratically within a block, and every one used to pay the
    // kernel; now they die on 26 integer subtractions (flagged at
    // ratio 14.7, re-measured well under the bar with the filter).
    val sigOf = (p: org.apache.spark.sql.Column) => array(
      ('a' to 'z').map(ch =>
        (length(p) - length(translate(p, ch.toString, ""))).cast("int")): _*)
    val d = docs
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / maxDist).cast("long").as("bucket"),
        substring(col("text"), 1, 256).as("prefix"))
      .withColumn("sig", sigOf(col("prefix")))
    // spread the probe side: the single-file scan is one task, and
    // the broadcast join (small dim side) keeps the DP verification
    // in that one task without this — at real scale, file splits
    // provide the parallelism and this repartition is a no-op cost
    val a = d.repartition(col("doc_id"))
      .select(col("doc_id").as("id_a"), col("lang"),
        explode(array(col("bucket") - 1, col("bucket"),
          col("bucket") + 1)).as("bucket"),
        col("prefix").as("pa"), col("sig").as("sa"))
    val b = d.select(col("doc_id").as("id_b"), col("lang"),
      col("bucket"), col("prefix").as("pb"), col("sig").as("sb"))
    a.join(b, Seq("lang", "bucket"))
      .filter(col("id_b") > col("id_a"))
      // native codegen'd L1 (BagDistanceExpr) — the interpreted
      // zip_with fold cost about as much per pair as the kernel it
      // guards; the fused loop is ~10x cheaper
      .filter(graft.functions.BagDistanceExpr
        .bagL1(col("sa"), col("sb")) <= lit(2 * maxDist))
      .select(col("id_a"), col("id_b"),
        graft.functions.BandedLevenshteinExpr
          .bandedLevenshtein(col("pa"), col("pb"), maxDist)
          .as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  private val stopListSql = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")

  private def markers(lang: String): String =
    TextFunctions.LangMarkers(lang).map(w => s"'$w'").mkString(", ")

  /** Ground-truth oracle for the composed curation pipeline: lang-ID +
    * quality gate + exact dedup exactly as the engine computes them,
    * then BRUTE-FORCE all-pairs Jaccard for near-dup edges and
    * connected components via a recursive reachability CTE. The engine
    * side goes through LSH banding — equality holds because banding at
    * 64 perms / 16 bands misses a >=0.9 pair with probability ~4e-8,
    * and both sides are fully deterministic (seeded permutations), so
    * the comparison is a fixture, not a coin flip.
    */
  private val curationOracle: String =
    s"""WITH docs AS (
      |  SELECT doc_id, text, lang
      |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
      |  WHERE doc_id < 500),
      |scored AS (
      |  SELECT doc_id, text,
      |    len(list_filter(string_split(text,' '), t -> t IN (${markers("de")}))) AS s_de,
      |    len(list_filter(string_split(text,' '), t -> t IN (${markers("en")}))) AS s_en,
      |    len(list_filter(string_split(text,' '), t -> t IN (${markers("es")}))) AS s_es,
      |    len(list_filter(string_split(text,' '), t -> t IN (${markers("fr")}))) AS s_fr,
      |    len(list_filter(string_split(text,' '), t -> t IN (${markers("zh")}))) AS s_zh
      |  FROM docs),
      |en AS (
      |  SELECT doc_id, text FROM scored
      |  WHERE CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
      |             WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
      |             WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
      |             WHEN s_fr >= s_zh THEN 'fr'
      |             ELSE 'zh' END = 'en'),
      |gated AS (
      |  SELECT doc_id, text FROM en
      |  WHERE len(string_split(text,' ')) BETWEEN 5 AND 100000),
      |exact AS (
      |  SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
      |  FROM gated GROUP BY md5(lower(trim(text)))),
      |ws AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS w FROM exact),
      |edges AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM ws a JOIN ws b ON a.doc_id <> b.doc_id
      |  WHERE CAST(len(list_intersect(a.w,b.w)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.w,b.w))) >= 0.9),
      |reach AS (
      |  WITH RECURSIVE r(id, seen) AS (
      |    SELECT doc_id, doc_id FROM exact
      |    UNION
      |    SELECT e.src, r.seen FROM edges e JOIN r ON r.id = e.dst)
      |  SELECT id, min(seen) AS cluster_id FROM r GROUP BY id),
      |survivors AS (
      |  SELECT e.doc_id, e.text FROM exact e JOIN reach ON reach.id = e.doc_id
      |  WHERE reach.cluster_id = e.doc_id)
      |SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
      |  CAST(length(text) AS INT) AS n_chars
      |FROM survivors ORDER BY doc_id""".stripMargin

  /** [[curationOracle]] with the fixed model's logit as an extra gate
    * between the heuristic CTEs and dedup — the identical
    * left-associated IEEE arithmetic quality_model_score pins.
    */
  private val curationModelOracle: String = {
    val featsAndModel =
      s"""feats AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS nt,
        |    CAST(len(list_filter(string_split(text,' '),
        |      t -> t IN ($stopListSql))) AS DOUBLE) AS nstop,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[.,!?;:]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(len(list_distinct(string_split(text,' ')))
        |      AS DOUBLE) AS ndist
        |  FROM gated),
        |modeled AS (
        |  SELECT doc_id, text FROM feats
        |  WHERE ((((-2.5 + 2.0 * (nt / (nt + 20.0)))
        |    + 8.0 * (nstop / nt))
        |    + 10.0 * (npunct / nchars))
        |    + 1.0 * (ndist / nt)) > 0.0),
        |exact AS (""".stripMargin
    curationOracle
      .replace("exact AS (", featsAndModel)
      .replace("FROM gated GROUP BY", "FROM modeled GROUP BY")
  }

  val oracle: Map[String, String] = Map(
    "curation_pipeline" -> curationOracle,
    "curation_model_pipeline" -> curationModelOracle,

    "link_fuzzy_names" ->
      """WITH probes AS (
        |  SELECT p_partkey AS probe_id,
        |         regexp_replace(p_name, '[aeiou]', '', 'g') AS probe_name
        |  FROM part WHERE p_partkey % 7 = 0),
        |cands AS (
        |  SELECT p_partkey AS part_id, p_name AS name,
        |         substr(regexp_replace(p_name, '[aeiou]', '', 'g'), 1, 4) AS blk
        |  FROM part),
        |scored AS (
        |  SELECT c.part_id, p.probe_id,
        |         jaro_winkler_similarity(c.name, p.probe_name) AS sim
        |  FROM cands c JOIN probes p ON substr(p.probe_name, 1, 4) = c.blk
        |  WHERE jaro_winkler_similarity(c.name, p.probe_name) >= 0.84),
        |ranked AS (
        |  SELECT probe_id, part_id, sim,
        |    count(*) OVER (PARTITION BY probe_id) AS n_above,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY sim DESC, part_id) AS rn
        |  FROM scored)
        |SELECT probe_id, part_id AS match_id, sim, n_above
        |FROM ranked WHERE rn = 1 ORDER BY probe_id""".stripMargin,

    "text_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n_total FROM t),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term)
        |SELECT term, cnt, (10000 * cnt) // n_total AS freq_bp
        |FROM c CROSS JOIN n WHERE cnt * 64 > n_total
        |ORDER BY cnt DESC, term""".stripMargin,

    "dedup_containment" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |s AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
        |    for i in range(1, len(toks) - 3)]) AS sh FROM t),
        |e0 AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS g
        |  FROM s),
        |df AS (SELECT g, count(*) AS df FROM e0 GROUP BY g),
        |e AS (SELECT e0.doc_id, e0.g FROM e0 JOIN df ON e0.g = df.g
        |  WHERE df.df <= 100),
        |n AS (SELECT doc_id, count(*) AS n_sh FROM e GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS shared
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  (p.shared * 10000) // n.n_sh AS containment_bp
        |FROM p JOIN n ON p.id_a = n.doc_id
        |WHERE p.shared * 10 >= n.n_sh * 6
        |ORDER BY p.id_a, p.id_b""".stripMargin,

    // ground truth for the 32-band unigram LSH query: brute-force
    // all-pairs word-set Jaccard (recall is ~1 - 6e-15 per pair at
    // this banding, and both sides are deterministic — see the query)
    "dedup_minhash_lsh" ->
      """WITH ws AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id < 500)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.w, b.w))) AS jaccard
        |FROM ws a JOIN ws b ON b.doc_id > a.doc_id
        |WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.w, b.w))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "text_stats" ->
      """SELECT doc_id, lang,
        |  length(text) AS len_chars,
        |  length(string_split(text, ' ')) AS n_tokens,
        |  length(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id""".stripMargin,

    // the fixed model's logit recomputed with the identical
    // left-associated IEEE double arithmetic (no exp/log anywhere)
    "quality_model_score" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ($stopListSql))) AS DOUBLE) AS nstop,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,!?;:]', '', 'g')) AS DOUBLE) AS npunct,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(len(list_distinct(string_split(text, ' ')))
         |      AS DOUBLE) AS ndist
         |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
         |z AS (
         |  SELECT doc_id,
         |    ((((-2.5 + 2.0 * (nt / (nt + 20.0)))
         |      + 8.0 * (nstop / nt))
         |      + 10.0 * (npunct / nchars))
         |      + 1.0 * (ndist / nt)) AS logit
         |  FROM f)
         |SELECT doc_id,
         |  CAST(floor(logit * 1000000.0) AS BIGINT) AS logit_scaled,
         |  logit > 0.0 AS kept
         |FROM z ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |  len(list_filter(string_split(text, ' '), t -> t IN ($stopListSql))) AS n_stop,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopListSql))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS stop_ratio
         |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id""".stripMargin,

    "text_langid" -> TextFunctions.langIdOracleSql,

    "text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp,
        |  min(doc_id) AS survivor_id, count(*) AS n_copies
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') GROUP BY fp ORDER BY survivor_id""".stripMargin,

    "array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT doc_id, CAST(len(toks) AS INT) AS n,
        |  list_sort(toks)[1] AS first_sorted,
        |  array_to_string(toks[1:3], '-') AS head3,
        |  list_contains(toks, 'data') AS has_data,
        |  len(list_intersect(toks, ['table', 'stream'])) > 0
        |    AS has_table_or_stream,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct
        |FROM t ORDER BY doc_id""".stripMargin,

    "filter_relative_length" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |p AS (SELECT quantile_cont(n_tokens, 0.25) AS p FROM t)
        |SELECT lang, count(*) AS n_kept, min(n_tokens) AS min_tokens
        |FROM t CROSS JOIN p WHERE n_tokens >= p.p
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "text_length_histogram" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT n_tokens // 16 AS bucket, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    // SimHash ground truth: rebuild the fingerprint from the same
    // md5-60-bit token hashes (sign-of-sum per bit, strict > 0), then
    // brute-force all pairs at hamming <= 3 — pigeonhole banding in
    // the engine has recall 1 at this threshold, so the sets match.
    "dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ' '),
        |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id < 500),
        |f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(0, 64), i ->
        |        CASE WHEN list_reduce(list_prepend(0,
        |            list_transform(th, h -> (((h >> i) & 1) * 2 - 1)::INT)),
        |            (a, b) -> a + b) > 0
        |        THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
        |      (a, b) -> a + b) AS fp
        |  FROM d)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming_bits
        |FROM f a JOIN f b ON b.doc_id > a.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars // 16 AS bucket,
        |    substr(text, 1, 256) AS p
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
        |FROM d a JOIN d b
        |  ON a.lang = b.lang
        |  AND b.bucket BETWEEN a.bucket - 1 AND a.bucket + 1
        |  AND b.doc_id > a.doc_id
        |WHERE levenshtein(a.p, b.p) <= 16
        |ORDER BY edit_dist, id_a, id_b""".stripMargin,

    "dedup_jaccard_pairs" ->
      """WITH ws AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.words, b.words))) AS jaccard
        |FROM ws a JOIN ws b
        |  ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 3
        |WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.words, b.words))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "text_token_freq" ->
      """SELECT token, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token
        |      FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin,

    "pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |    doc_id % 8 AS shard
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS seq_offset
        |  FROM toks)
        |SELECT doc_id, shard,
        |  CAST(shard * 1000000 + seq_offset // 512 AS BIGINT) AS seq_id,
        |  CAST(seq_offset AS BIGINT) AS seq_offset
        |FROM packed ORDER BY doc_id""".stripMargin,

    "multimodal_binary" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') GROUP BY source ORDER BY source""".stripMargin,

    // mirrors the RollingHashExpr kernel exactly: per-window polynomial
    // hash folded via nested list lambdas (ord(text[i]) == the code
    // point; ASCII corpus), distinct minima sorted, first 16 kept
    "text_rolling_fp" ->
      """WITH t AS (
        |  SELECT doc_id, text, greatest(length(text) - 7, 1) AS w
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(range(1, w + 1), s ->
        |      list_reduce(
        |        list_prepend(0::BIGINT, list_transform(range(0, 8), j ->
        |          CASE WHEN s + j <= length(text)
        |            THEN ord(text[CAST(s + j AS INT)])::BIGINT ELSE 0 END)),
        |        (acc, c) -> (acc * 257 + c) % 1000000007)) AS hs
        |  FROM t),
        |fp AS (
        |  SELECT doc_id, (list_sort(list_distinct(hs)))[1:16] AS f FROM h)
        |SELECT doc_id, CAST(len(f) AS INT) AS n_hashes, f[1] AS min_hash
        |FROM fp ORDER BY doc_id""".stripMargin,

    // the planted perceptual-group structure is doc_id arithmetic:
    // group = doc_id % 97 over the doc_id % 41 = 0 sample; distinct
    // fingerprints == distinct groups (md5-derived 64-bit patterns,
    // collision-free at this cardinality); widths/heights from the
    // member-size formula — no image decoding needed oracle-side
    "multimodal_phash" ->
      """WITH s AS (
        |  SELECT doc_id, doc_id % 97 AS g
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id % 41 = 0),
        |grp AS (SELECT g, count(*) AS members FROM s GROUP BY g)
        |SELECT
        |  (SELECT CAST(sum(members) AS BIGINT) FROM grp) AS n_images,
        |  (SELECT CAST(count(*) AS BIGINT) FROM grp) AS n_groups,
        |  (SELECT CAST(sum(members * (members - 1)) / 2 AS BIGINT)
        |     FROM grp) AS n_pairs,
        |  (SELECT CAST(sum(9 * (8 + doc_id % 5)) AS BIGINT) FROM s)
        |    AS sum_w,
        |  (SELECT CAST(sum(8 * (8 + doc_id % 3)) AS BIGINT) FROM s)
        |    AS sum_h""".stripMargin,

    // same-group members share frames clip..11; the vote is the
    // intersection size 12 − max(clipA, clipB)
    "multimodal_video" ->
      """WITH s AS (
        |  SELECT doc_id, doc_id % 7 AS g, doc_id % 3 AS clip
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id % 11 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(12 - GREATEST(a.clip, b.clip) AS BIGINT)
        |    AS n_shared_frames
        |FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE 12 - GREATEST(a.clip, b.clip) >= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // AVI variant: identical arithmetic over the %13/%5 sample — a
    // lossless (DIB) container keeps frame hashes exact
    "multimodal_video_avi" ->
      """WITH s AS (
        |  SELECT doc_id, doc_id % 5 AS g, doc_id % 3 AS clip
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id % 13 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(12 - GREATEST(a.clip, b.clip) AS BIGINT)
        |    AS n_shared_frames
        |FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE 12 - GREATEST(a.clip, b.clip) >= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // square-wave closed forms: N = P·m samples, sum of squares
    // N·A², 2m−1 sign transitions, peak A — pure doc_id arithmetic
    "multimodal_audio" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    20 + (doc_id % 5) * 20 AS p,
        |    40 + doc_id % 7 AS m,
        |    1000 + (doc_id % 10) * 500 AS a
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id % 41 = 0)
        |SELECT media_id,
        |  CAST(p * m AS BIGINT) AS n_samples,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(p * m * 125 AS BIGINT) AS duration_us,
        |  CAST(p * m * a * a AS BIGINT) AS sum_sq,
        |  CAST(2 * m - 1 AS BIGINT) AS zero_crossings,
        |  CAST(a AS INT) AS peak
        |FROM s ORDER BY media_id""".stripMargin,

    // the aspect-preserving 48px box from the construction formula:
    // scale = min(1, 48/max(w0,h0)), truncating multiply — the same
    // IEEE double ops the Scala fitBox performs
    "multimodal_resize" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    9 * (8 + doc_id % 5) AS w0, 8 * (8 + doc_id % 3) AS h0
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE doc_id % 41 = 0),
        |b AS (
        |  SELECT media_id,
        |    LEAST(CAST(1.0 AS DOUBLE),
        |      CAST(48.0 AS DOUBLE) / GREATEST(w0, h0)) AS sc, w0, h0
        |  FROM s)
        |SELECT media_id,
        |  GREATEST(CAST(FLOOR(w0 * sc) AS INT), 1) AS width,
        |  GREATEST(CAST(FLOOR(h0 * sc) AS INT), 1) AS height
        |FROM b ORDER BY media_id""".stripMargin,

    // mirrors Multimodal.decodeStub byte-for-byte: rolling checksum
    // c = c*31 + byte with 64-bit wraparound, folded in HUGEINT then
    // re-signed. ord(text[i]) == the UTF-8 byte because the corpus is
    // ASCII (verified: length == octet_length for every doc at sf0.01).
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(1, length(text) + 1),
        |          i -> ord(text[i])::HUGEINT)),
        |      (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS c
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT media_id, kind, n_bytes,
        |  CAST(CASE WHEN c >= 9223372036854775808::HUGEINT
        |    THEN c - 18446744073709551616::HUGEINT ELSE c END AS BIGINT)
        |    AS checksum
        |FROM m ORDER BY media_id""".stripMargin,

    "text_regex_extract" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[0-9]+') AS nums,
        |    regexp_extract_all(text, '[A-Z][a-z]+') AS caps
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT doc_id,
        |  len(nums) AS n_numbers,
        |  COALESCE(nums[1], '') AS first_number,
        |  len(caps) AS n_capitalized,
        |  COALESCE(caps[-1], '') AS last_capitalized
        |FROM e ORDER BY doc_id""".stripMargin,

    // ground truth for the prefix-filtered join: every pair, exact
    // hashed-shingle Jaccard (identical md5-60bit fold), same integer
    // threshold and basis points
    "dedup_allpairs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |  WHERE len(string_split(text, ' ')) >= 5),
        |s AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
        |    for i in range(1, len(toks) - 3)]) AS sh FROM t),
        |d AS (
        |  SELECT doc_id, list_transform(sh,
        |    g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) AS hs FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.hs, b.hs))::BIGINT AS inter,
        |    len(a.hs)::BIGINT AS n_a, len(b.hs)::BIGINT AS n_b
        |  FROM d a JOIN d b ON b.doc_id > a.doc_id)
        |SELECT id_a, id_b, inter, n_a, n_b,
        |  (inter * 10000) // (n_a + n_b - inter) AS jaccard_bp
        |FROM pairs
        |WHERE inter * 10 >= (n_a + n_b - inter) * 9
        |ORDER BY id_a, id_b""".stripMargin,

    // identical injection via chr() codepoints (768=U+0300 grave,
    // 233=é, 776=U+0308 diaeresis, 1090=Cyrillic т); utf8proc
    // nfc_normalize oracles the JDK normalizer
    "text_unicode_nfc" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN CASE WHEN strpos(text, 'a') > 0
        |        THEN substr(text, 1, strpos(text, 'a') - 1)
        |          || 'a' || chr(768) || substr(text, strpos(text, 'a') + 1)
        |        ELSE text END
        |      WHEN 1 THEN CASE WHEN strpos(text, 'e') > 0
        |        THEN substr(text, 1, strpos(text, 'e') - 1)
        |          || chr(233) || substr(text, strpos(text, 'e') + 1)
        |        ELSE text END
        |      WHEN 2 THEN CASE WHEN strpos(text, 'o') > 0
        |        THEN substr(text, 1, strpos(text, 'o') - 1)
        |          || 'o' || chr(776) || substr(text, strpos(text, 'o') + 1)
        |        ELSE text END
        |      ELSE CASE WHEN strpos(text, 't') > 0
        |        THEN substr(text, 1, strpos(text, 't') - 1)
        |          || chr(1090) || substr(text, strpos(text, 't') + 1)
        |        ELSE text END
        |    END AS dirty
        |  FROM documents),
        |n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS nfc FROM inj)
        |SELECT doc_id, (nfc <> dirty) AS changed,
        |  length(dirty)::BIGINT AS len_dirty,
        |  length(nfc)::BIGINT AS len_nfc,
        |  len(regexp_extract_all(nfc, '[\x{0400}-\x{04FF}]'))::BIGINT
        |    AS n_cyr,
        |  substr(nfc, 1, 20) AS head20
        |FROM n ORDER BY doc_id""".stripMargin,

    "sql_native_funcs" ->
      """SELECT c_custkey,
        |  jaro_winkler_similarity(c_name, 'Customer#000000010') AS jw,
        |  nfc_normalize('cafe' || chr(769) || ' ' || c_name)
        |    AS norm_name
        |FROM customer
        |WHERE c_custkey <= 50
        |ORDER BY c_custkey""".stripMargin,
  )
}
