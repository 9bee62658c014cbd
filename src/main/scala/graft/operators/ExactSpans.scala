package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SpanExtendExpr, WinnowExpr}

/** Corpus-internal EXACT substring-span dedup with exact boundaries:
  * finds every maximal token run of length ≥ `minLen` shared by two
  * documents, reporting `(id_a, id_b, start_a, start_b, span_len)` —
  * the report a span-removal transform consumes (cut the duplicated
  * region from one side) where the strided form only estimates
  * per-doc ratios and misses runs straddling stride boundaries.
  *
  * Shape:
  *  1. winnowed positional fingerprints per doc
  *     ([[graft.functions.WinnowExpr]], window `w = minLen − k + 1`):
  *     any shared run of length ≥ minLen selects at least one COMMON
  *     aligned fingerprint in both docs (Schleimer et al. 2003), and
  *     only ~2/(w+1) of positions ship to the shuffle — the bound
  *     every-position n-grams lack;
  *  2. anchor equi-join on the fingerprint (id_a < id_b), distinct;
  *  3. token arrays join back to the CANDIDATE pairs only, and the
  *     native [[graft.functions.SpanExtendExpr]] verifies the anchor
  *     (hash collisions discarded) and extends to the maximal run —
  *     all anchors inside one run converge to the same maximal
  *     extent, deduplicated.
  *
  * Scale: the anchor shuffle is O(corpus/w); the pair/extension tail
  * is output-bound (pairs exist only where real duplication exists).
  * A boilerplate fingerprint shared by B docs still implies B² real
  * span pairs — the output itself — so there is no hidden quadratic
  * beyond what the caller asked to enumerate; a production run over
  * 100 TB bounds it by pre-filtering hot fingerprints (df cap, same
  * move as the containment index's stop-shingles) at the cost of
  * missing the hottest boilerplate spans.
  */
object ExactSpans {

  def spans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 16, k: Int = 8): DataFrame =
    spansFromTokens(
      docs.select(col(idCol), split(col(textCol), " ").as("__toks")),
      idCol, "__toks", minLen, k)

  /** Token-array form (caller controls tokenization/slicing). */
  def spansFromTokens(docs: DataFrame, idCol: String, toksCol: String,
      minLen: Int = 16, k: Int = 8): DataFrame = {
    require(k >= 2 && minLen >= k,
      s"need 2 <= k <= minLen, got k=$k minLen=$minLen")
    val w = minLen - k + 1
    val toks = docs.select(col(idCol).as("__doc"), col(toksCol).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchors = toks
      .select(col("__doc"),
        explode(WinnowExpr.winnow(col("__t"), k, w)).as("a"))
      .select(col("__doc"), col("a.pos").as("pos"), col("a.fp").as("fp"))
    val pairs = anchors.as("x").join(anchors.as("y"),
        col("x.fp") === col("y.fp") && col("x.__doc") < col("y.__doc"))
      .select(col("x.__doc").as("id_a"), col("x.pos").as("pos_a"),
        col("y.__doc").as("id_b"), col("y.pos").as("pos_b"))
      .distinct()
    val withToks = pairs
      .join(toks.select(col("__doc").as("id_a"), col("__t").as("toks_a")),
        Seq("id_a"))
      .join(toks.select(col("__doc").as("id_b"), col("__t").as("toks_b")),
        Seq("id_b"))
    withToks
      .select(col("id_a"), col("id_b"),
        SpanExtendExpr.spanExtend(col("toks_a"), col("pos_a"),
          col("toks_b"), col("pos_b"), k).as("s"))
      .filter(col("s").isNotNull && col("s.len") >= minLen)
      .select(col("id_a"), col("id_b"),
        col("s.start_a").as("start_a"), col("s.start_b").as("start_b"),
        col("s.len").as("span_len"))
      .distinct()
  }

  /** Apply the report: keep-first span REMOVAL with exact boundaries.
    * A token of doc D is cut iff some reported span covers it on D's
    * LATER side (`id_b = D` — the earlier doc of every pair keeps its
    * copy), so one canonical copy of every duplicated run survives
    * corpus-wide per pair ordering. Output per doc: original token
    * count, removed count, and the md5 fingerprint of the reassembled
    * text — the exact-boundary upgrade of chunk-grid boilerplate
    * removal (`curate_span_removal`), which cuts whole 16-token cells
    * and misses off-grid runs.
    *
    * The interval mask is a per-doc higher-order expression over the
    * collected (small) span list — no extra shuffle beyond the span
    * report itself.
    */
  def removeSpans(docs: DataFrame, idCol: String, toksCol: String,
      minLen: Int = 16, k: Int = 8): DataFrame = {
    val sp = spansFromTokens(docs, idCol, toksCol, minLen, k)
    val intervals = sp.groupBy(col("id_b").as(idCol))
      .agg(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("span_len")).as("e"))).as("iv"))
    docs.select(col(idCol), col(toksCol).as("__t"))
      .join(intervals, Seq(idCol), "left")
      .withColumn("kept",
        when(col("iv").isNull, col("__t")).otherwise(expr(
          """transform(
             filter(sequence(0, size(__t) - 1),
               i -> NOT exists(iv, v -> i >= v.s AND i < v.e)),
             i -> element_at(__t, i + 1))""")))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        (size(col("__t")) - size(col("kept"))).cast("long")
          .as("n_removed"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("clean_fp"))
  }
}
