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
  * distinct eval n-gram set builds once and BROADCASTS; the training
  * side streams through a map-side semi-join — no shuffle touches the
  * 100 TB side. Per-doc totals are computed from the materialized
  * n-gram array BEFORE the explode, so unmatched docs never enter the
  * join at all and short docs (< n tokens) are preserved with zero
  * grams rather than dropped by the explode.
  */
object Decontaminate {

  /** All word `n`-grams of a pre-materialized token array as
    * space-joined strings; empty below `n` tokens. Takes the
    * materialized column, not the text — an inline `split` would
    * re-tokenize once per window position (the recomputation trap
    * `Dedup.minhashFromHashes` documents).
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
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
      textCol: String, n: Int = 8, threshold: Double = 0.2): DataFrame = {
    def withGrams(df: DataFrame): DataFrame = df
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("grams",
        array_distinct(wordNgramsFromTokens(col("toks"), n)))

    // small side: global distinct eval n-grams, broadcast below
    val evalGrams = withGrams(eval)
      .select(explode(col("grams")).as("ngram")).distinct()

    val t = withGrams(train)
      .select(col(idCol), size(col("grams")).as("n_ngrams"), col("grams"))

    // left-semi against the broadcast set: only matching grams survive,
    // so the groupBy state is bounded by contamination volume, not
    // corpus volume
    val matched = t
      .select(col(idCol), explode(col("grams")).as("ngram"))
      .join(broadcast(evalGrams), Seq("ngram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_matched"))

    // matched is bounded by contamination volume (small by construction)
    // — broadcast it back onto the corpus-sized totals
    t.select(col(idCol), col("n_ngrams"))
      .join(broadcast(matched), Seq(idCol), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("contamination_ratio",
        when(col("n_ngrams") > 0,
          col("n_matched").cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("contamination_ratio") >= threshold)
  }
}
