package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share long
  * word n-grams with an evaluation/benchmark set, the overlap check a
  * training pipeline runs before any corpus ships (the reference system
  * exports raw CDC rows and has no analog; this is part of the
  * training-data extension surface).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus
  * (thousands of eval docs vs billions of training docs), so the
  * distinct eval n-gram set builds once and BROADCASTS, and the
  * corpus side tags hits in a map-side broadcast join. The only
  * corpus-side shuffle is the per-doc re-group, whose partial
  * aggregation collapses each doc to ONE tiny count row before the
  * exchange — document text never shuffles (unless the caller opts
  * into `spreadSmallInput`, a test-scale convenience). Short docs
  * (< n tokens) are preserved as zero-gram rows via explode_outer.
  */
object Decontaminate {

  /** All word `n`-grams of a pre-materialized token array as
    * space-joined strings; empty below `n` tokens. Takes the
    * materialized column, not the text — an inline `split` would
    * re-tokenize once per window position (the recomputation trap
    * `Dedup.minhashFromHashes` documents).
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    stridedNgramsFromTokens(toks, n, stride = 1)

  /** N-grams at every `stride`-th position — stride 1 is the dense
    * n-gram window; stride > 1 bounds span volume to size/stride per
    * doc (the repeated-span detection shape).
    */
  def stridedNgramsFromTokens(toks: Column, n: Int, stride: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1), lit(stride)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Per-training-doc contamination report against `eval`.
    *
    * Both inputs need (`idCol`, `textCol`). Output: one row per
    * training doc — distinct n-gram count, matched count against the
    * eval set, contamination ratio, and the `contaminated` verdict at
    * `threshold` (fraction of the doc's distinct n-grams that appear in
    * any eval doc).
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, threshold: Double = 0.2,
      spreadSmallInput: Boolean = false,
      hashGrams: Boolean = false): DataFrame = {
    // `hashGrams` replaces each n-gram string with its xxhash64 before
    // the distinct/broadcast/join — the broadcast eval set carries 8
    // bytes per gram instead of ~8 words of text, which is what keeps
    // a realistically-sized eval suite (10^7-10^8 grams) inside
    // executor memory at 100 TB. A hash collision can only ADD a
    // false hit (P ~ n_corpus_grams * n_eval_grams / 2^64 — negligible)
    // and the verdict is a ratio over >= threshold, so hashed and
    // string modes agree in practice; the string path stays the
    // default because it is what the exact oracle checks.
    def gramKey(grams: Column): Column =
      if (hashGrams) transform(grams, g => xxhash64(g)) else grams
    def withGrams(df: DataFrame): DataFrame = df
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("grams",
        gramKey(array_distinct(wordNgramsFromTokens(col("toks"), n))))

    // small side: global distinct eval n-grams, broadcast below
    val evalGrams = withGrams(eval)
      .select(explode(col("grams")).as("ngram")).distinct()

    // ONE gram pass over the corpus: carry the per-doc total on each
    // exploded row, tag hits against the broadcast eval set, re-group.
    // (A totals-branch + match-branch formulation evaluates the
    // interpreted n-gram lambda twice over the whole corpus — measured
    // 2× the runtime of this single-pass shape.) explode_outer keeps
    // zero-gram short docs as a null-gram row that matches nothing.
    // `spreadSmallInput` shuffles the corpus ONCE to spread
    // gram-building across cores when the input arrives as one small
    // file (bench/test scale); leave it off at real scale, where file
    // splits already provide the parallelism and shuffling document
    // text would be pure waste.
    val spread =
      if (spreadSmallInput) train.repartition(col(idCol)) else train
    val exploded = withGrams(spread)
      .select(col(idCol), size(col("grams")).as("n_ngrams"),
        explode_outer(col("grams")).as("ngram"))
    exploded
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))),
        Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_ngrams")).as("n_ngrams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_matched"))
      .withColumn("contamination_ratio",
        when(col("n_ngrams") > 0,
          col("n_matched").cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("contamination_ratio") >= threshold)
  }

  /** Bloom-prefiltered contamination report — identical verdicts to
    * [[report]] (same output schema, same exact matching), restructured
    * for the regime where the eval n-gram set is TOO BIG TO BROADCAST
    * (a full eval-suite union easily reaches 10^8-10^9 grams):
    *
    *  1. the eval grams fold into ONE bloom filter (`bloom_filter_agg`
    *     over xxhash64 — `numBits/8` bytes total, broadcast as a
    *     single-row literal regardless of gram count);
    *  2. the corpus's exploded grams probe the filter map-side;
    *     might_contain=false rows — at real scale, almost all of them —
    *     drop before any join. A bloom has NO false negatives, so no
    *     true hit is lost;
    *  3. only the surviving candidates (true hits + the fpp sliver of
    *     false positives) meet the eval set in an exact equi-join that
    *     Spark is free to SHUFFLE — this join's left side is now tiny,
    *     so neither side needs to fit in executor memory;
    *  4. totals re-derive from the same exploded pass via a partial
    *     max-aggregation (one row per doc reaches the exchange), and a
    *     left join folds zero-candidate docs back in as n_matched=0.
    *
    * The exact join makes the bloom a pure PREFILTER: false positives
    * cost only wasted probe rows, never a wrong verdict, which is what
    * keeps this oracle-checkable (decontaminate_bloom hashes identical
    * to decontaminate_ngram's exact formulation in CORRECTNESS).
    */
  def reportBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, threshold: Double = 0.2,
      spreadSmallInput: Boolean = false,
      expectedGrams: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    def withGrams(df: DataFrame): DataFrame = df
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("grams",
        array_distinct(wordNgramsFromTokens(col("toks"), n)))

    val evalGrams = withGrams(eval)
      .select(explode(col("grams")).as("ngram")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // BloomFilterAggregate/BloomFilterMightContain are the engine's own
    // runtime-filter kernels (not SQL-registered); might_contain wants
    // a CONSTANT filter side, so the aggregated filter — numBits/8
    // bytes regardless of gram count — materializes on the driver and
    // rides into the probe as a literal (same driver-sized-metadata
    // pattern as Ivf's centroid table)
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bloomBytes: Array[Byte] = evalGrams
      .agg(GraftBridge.columnOf(new BloomFilterAggregate(
          GraftBridge.expressionOf(xxhash64(col("ngram"))),
          Literal(expectedGrams), Literal(numBits))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    def mightContainEval(value: Column): Column =
      if (bloomBytes == null) lit(false) // empty eval set: nothing matches
      else GraftBridge.columnOf(BloomFilterMightContain(
        Literal(bloomBytes), GraftBridge.expressionOf(value)))

    val spread =
      if (spreadSmallInput) train.repartition(col(idCol)) else train
    val exploded = withGrams(spread)
      .select(col(idCol), size(col("grams")).as("n_ngrams"),
        explode_outer(col("grams")).as("ngram"))
      // one gram pass feeds both the totals aggregation and the
      // candidate stream; at bench/test scale recomputing it twice is
      // noise, at 100 TB persist-after-bloom or a two-pass trade is
      // the caller's call — the semantics don't change either way
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val totals = exploded.groupBy(col(idCol))
      .agg(max(col("n_ngrams")).as("n_ngrams"))
    val candidates = exploded
      .filter(col("ngram").isNotNull)
      .filter(mightContainEval(xxhash64(col("ngram"))))
      .select(col(idCol), col("ngram"))
    val matched = candidates
      .join(evalGrams, Seq("ngram")) // exact verify — FPs die here
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"))

    totals.join(matched, Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("contamination_ratio",
        when(col("n_ngrams") > 0,
          col("n_matched").cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("contamination_ratio") >= threshold)
  }
}
