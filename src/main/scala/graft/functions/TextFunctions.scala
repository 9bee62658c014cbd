package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenizing,
  * quality signals, n-gram language scoring, normalization, binary
  * payload plumbing. Pure `Column` expressions throughout — codegen'd,
  * no UDFs — so they vectorize inside whole-stage codegen and scale
  * linearly with document partitions.
  */
object TextFunctions {

  /** Whitespace tokenizer (single-space corpus; a BPE-ish regex variant
    * is `bpeTokenCount`).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish sub-word token estimate: word-pieces + digit runs +
    * punctuation, via regex count (upper bound on merge-table tokens).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** English-ish function words used for quality's stopword ratio AND
    * the 'en' score of the language-ID heuristic. Order matters only
    * for documentation; matching is set membership.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit(_)): _*)))

  /** Normalization applied before fingerprinting/dedup. */
  def normalize(text: Column): Column = lower(trim(text))

  /** Opaque binary payload (multimodal column plumbing): text encoded
    * as UTF-8 bytes stands in for an image/audio blob.
    */
  def asBinaryPayload(text: Column): Column = encode(text, "UTF-8")

  // ---- language-ID: marker-token scoring with deterministic argmax ----

  /** Marker token sets per language. The corpus is synthetic English-ish
    * vocabulary, so these act as a deterministic scoring heuristic (the
    * shape of a real char-n-gram language model) rather than a trained
    * classifier.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "small", "data"),
    "en" -> Seq("the", "a", "of", "and", "is", "column", "sort"),
    "es" -> Seq("el", "la", "de", "que", "es", "line", "hash"),
    "fr" -> Seq("le", "la", "les", "et", "est", "order", "query"),
    "zh" -> Seq("de5", "shi4", "le5", "group", "vector"),
  )

  private def score(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))

  /** Adds s_de/s_en/s_es/s_fr/s_zh score columns and `predicted_lang` =
    * argmax with alphabetical tiebreak (de ≻ en ≻ es ≻ fr ≻ zh on ties).
    */
  def withLangScores(docs: DataFrame): DataFrame = {
    val scored = LangMarkers.toSeq.sortBy(_._1).foldLeft(docs) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang", score(col("text"), markers))
    }
    scored.withColumn("predicted_lang",
      when(col("s_de") >= greatest(col("s_en"), col("s_es"), col("s_fr"), col("s_zh")), "de")
        .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "en")
        .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
        .when(col("s_fr") >= col("s_zh"), "fr")
        .otherwise("zh"))
  }

  /** Word set for Jaccard similarity. */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** Char codes of the text as an array column, materialized once per
    * row for [[rollingHashFromCodes]]. Char-at-position via `substr` is
    * O(position) on UTF-8 strings, so folding windows directly over the
    * text is O(k·n²) per document; folding over this array is O(k·n).
    */
  def charCodes(text: Column): Column =
    transform(filter(split(text, ""), c => c =!= ""), c => ascii(c))

  /** Karp-Rabin rolling-hash document fingerprint from a pre-materialized
    * [[charCodes]] column: polynomial hashes of every `k`-char window
    * (h = Σ c_i·B^(k-1-i) mod M), then the winnowing-lite signature =
    * the `keep` smallest window hashes, sorted. Robust to document
    * reordering at block granularity, cheap to compare (array
    * intersection), pure expressions. Take the two-step form in
    * pipelines (same rule as `Dedup.minhashFromHashes`): the codes
    * attribute is evaluated once in the child project, then referenced
    * by every window.
    */
  def rollingHashFromCodes(codes: Column, k: Int = 8,
      keep: Int = 16): Column = {
    val B = 257L
    val M = 1000000007L
    // all W = n-k+1 window hashes at once: step j folds the j-th char of
    // every window via one flat zip_with over slice(codes, j+1, W) — k-1
    // elementwise passes, no per-window sequence allocation (higher-order
    // lambdas are interpreted, so per-element constant factors dominate).
    // Chars past the end (short docs) contribute 0, same as ascii('')
    // under the original substr formulation.
    val w = greatest(size(codes) - (k - 1), lit(1))
    val first = transform(slice(codes, lit(1), w), c => c.cast("long"))
    val hashes = (1 until k).foldLeft(first) { (acc, j) =>
      zip_with(acc, slice(codes, lit(j + 1), w),
        (h, c) => pmod(h * B + coalesce(c, lit(0)), lit(M)))
    }
    val fp = slice(array_sort(array_distinct(hashes)), 1, keep)
    // empty text: one all-padding window, hash 0 (original semantics)
    when(size(codes) === 0, array(lit(0L))).otherwise(fp)
  }

  /** Convenience single-expression fingerprint (tests / small inputs);
    * prefer `charCodes` + [[rollingHashFromCodes]] in pipelines — the
    * inline codes array would be re-evaluated per window here.
    */
  def rollingHashFingerprint(text: Column, k: Int = 8,
      keep: Int = 16): Column =
    rollingHashFromCodes(charCodes(text), k, keep)

  private def markerListSql(lang: String): String =
    LangMarkers(lang).map(w => s"'$w'").mkString(", ")

  /** DuckDB oracle replicating withLangScores exactly. */
  val langIdOracleSql: String = {
    def s(lang: String) =
      s"len(list_filter(string_split(text, ' '), t -> t IN (${markerListSql(lang)})))"
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${s("de")} AS s_de, ${s("en")} AS s_en, ${s("es")} AS s_es,
       |    ${s("fr")} AS s_fr, ${s("zh")} AS s_zh
       |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
       |SELECT doc_id, lang,
       |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
       |       WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
       |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
       |       WHEN s_fr >= s_zh THEN 'fr'
       |       ELSE 'zh' END AS predicted_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }
}
