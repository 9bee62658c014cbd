package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** EXACT all-pairs Jaccard similarity join by prefix filtering
  * (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW 2007; Chaudhuri et al.'s SSJoin prefix filter).
  *
  * LSH trades recall for speed; this operator keeps recall 1. The
  * filter: order every document's distinct tokens by one GLOBAL rarity
  * order (ascending document frequency, token as tiebreak) and keep
  * only the first p = n - ⌈τ·n⌉ + 1 tokens as the doc's PREFIX. Two
  * sets with Jaccard >= τ must overlap in >= ⌈τ·n⌉ tokens — more than
  * the n - p tokens outside either prefix — so they MUST share a
  * prefix token: the inverted-index equi-join on prefix tokens alone
  * generates a candidate superset with zero false negatives, and the
  * exact |A∩B| verify keeps the survivors.
  *
  * Scale shape: candidates come from postings lists of the RAREST
  * tokens of each doc (df-ascending order makes the prefix the doc's
  * most selective tokens), so candidate volume tracks rare-token
  * collisions instead of n²; the df table is a map-side-combined
  * groupBy; the verify join moves only (id, tokens) for candidate
  * pairs. The threshold is a rational num/denom and every filter
  * compare is integer (inter·denom >= num·union) — no float boundary.
  */
object AllPairs {

  /** Pairs (id_a < id_b) of `docs` rows whose distinct-token Jaccard
    * is >= num/denom. `docs` must expose `idCol` (numeric id) and
    * `tokCol` (array<string> of DISTINCT tokens). Output carries the
    * exact intersection/union sizes and basis-point similarity.
    */
  def jaccardJoin(docs: DataFrame, idCol: String, tokCol: String,
      num: Int, denom: Int): DataFrame = {
    require(num > 0 && denom > 0 && num <= denom)
    // the doc/token frame feeds four consumers (df counts, prefix
    // assembly, both verify sides): persist once instead of replaying
    // the caller's tokenize/hash lineage per consumer
    val d = docs.select(col(idCol).as("id"), col(tokCol).as("toks"))
      .filter(size(col("toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val df_ = d.select(col("id"), explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

    // prefix length: p = n - ceil(num*n/denom) + 1, integer ceil
    val prefixed = d.select(col("id"), explode(col("toks")).as("token"))
      .join(df_, Seq("token"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("token"))))
        .as("ord"))
      .select(col("id"),
        transform(col("ord"), e => e.getField("token")).as("sorted"),
        size(col("ord")).as("n"))
      .select(col("id"), col("sorted"), col("n"),
        (col("n") - expr(s"($num * n + ${denom - 1}) div $denom")
          + lit(1)).as("p"))

    // both sides of the candidate self-join read this: persist so the
    // df join + per-doc sort assembly runs once
    val prefixTok = prefixed
      .select(col("id"), col("n"),
        explode(slice(col("sorted"), lit(1), col("p"))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = prefixTok.select(col("token"),
        col("id").as("id_a"), col("n").as("n_a"))
      .join(prefixTok.select(col("token"),
        col("id").as("id_b"), col("n").as("n_b")), Seq("token"))
      .filter(col("id_a") < col("id_b"))
      // size filter: |A∩B| <= min(n_a,n_b) and J >= num/denom force
      // min·denom >= max·num — kills size-mismatched candidates before
      // the distinct and the array-carrying verify join
      .filter(least(col("n_a"), col("n_b")) * denom >=
        greatest(col("n_a"), col("n_b")) * num)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .distinct()

    val verify = cands
      .join(d.select(col("id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
      .join(d.select(col("id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * denom >= col("uni") * num)
    verify.select(col("id_a"), col("id_b"), col("inter"),
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
      expr("inter * 10000 div uni").as("jaccard_bp"))
  }
}
