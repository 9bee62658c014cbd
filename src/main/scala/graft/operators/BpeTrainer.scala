package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE vocabulary induction (Sennrich et al., ACL 2016):
  * K merge rounds over a tokenized corpus, each round promoting the
  * globally most frequent adjacent symbol pair to a new symbol.
  *
  * Per round the cluster work is ONE map-side-combined groupBy: pair
  * counts from a narrow per-doc explode of adjacent symbol pairs.
  * The argmax (count desc, pair asc — a deterministic tiebreak, so
  * training is reproducible) is a driver-sized reduction over the
  * distinct-pair table's top row, mirroring how production BPE
  * trainers centralize the merge decision while distributing the
  * counting. Re-tokenization applies the chosen merge inside a
  * higher-order `aggregate` fold per document — left-to-right,
  * non-overlapping, exactly the reference semantics — so the corpus
  * never leaves the executors and each round's corpus is one narrow
  * projection of the previous (persisted, checkpoint-style).
  *
  * Scale: counting shuffles |distinct pairs| partial rows, the merge
  * decision moves ONE row to the driver per round, re-tokenization is
  * embarrassingly parallel. K is the vocabulary budget (fixed, small
  * in tests; tens of thousands in production — each round O(corpus)
  * narrow + O(distinct pairs) shuffle).
  */
object BpeTrainer {

  /** Left-to-right non-overlapping merge of adjacent (l, r) into
    * `joined` over a symbol array — the reference BPE re-tokenize
    * step, as a codegen-friendly higher-order fold.
    */
  private def applyMerge(toks: Column, l: String, r: String,
      joined: String): Column = {
    // fold state: (out array, pending flag) — pending=1 means the
    // previous symbol was `l` and is NOT yet emitted; seeing `r` now
    // emits the merged symbol, anything else flushes `l` first.
    // Scan each symbol once; a merged pair can't chain into the next
    // merge (non-overlapping), matching the sequential reference.
    val init = struct(array().cast("array<string>").as("out"),
      lit(0).as("pending"))
    val folded = aggregate(
      toks,
      init,
      (acc, t) => {
        val out = acc.getField("out")
        val pending = acc.getField("pending")
        when(pending === 1 && t === lit(r),
          struct(concat(out, array(lit(joined))).as("out"),
            lit(0).as("pending")))
          .when(t === lit(l),
            struct(when(pending === 1, concat(out, array(lit(l))))
              .otherwise(out).as("out"), lit(1).as("pending")))
          .otherwise(
            struct(concat(
              when(pending === 1, concat(out, array(lit(l))))
                .otherwise(out), array(t)).as("out"),
              lit(0).as("pending")))
      },
      acc => when(acc.getField("pending") === 1,
        concat(acc.getField("out"), array(lit(l))))
        .otherwise(acc.getField("out")))
    folded
  }

  /** Train `k` merges over `docs(idCol, tokCol: array<string>)`.
    * Returns (merges in order, final corpus frame). Symbols are
    * joined with no separator (caller supplies pre-split symbols,
    * e.g. characters or whitespace tokens).
    */
  def train(spark: SparkSession, docs: DataFrame, idCol: String,
      tokCol: String, k: Int): (Seq[(String, String)], DataFrame) = {
    require(k >= 0)
    var corpus = docs.select(col(idCol).as("id"), col(tokCol).as("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to k) {
      // adjacent pairs, counted with map-side partials; ONE row
      // (count desc, pair asc) reaches the driver
      val top = corpus
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(slice(toks, 1, size(toks) - 1), " +
            "(t, i) -> named_struct('l', t, 'r', toks[i + 1]))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty && top(0).getLong(2) >= 2) {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val next = corpus
          .select(col("id"), applyMerge(col("toks"), l, r, l + r).as("toks"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before unpersisting the parent
        corpus.unpersist()
        corpus = next
      }
    }
    (merges.toSeq, corpus)
  }

  /** Encode a corpus with an already-trained merge list: apply each
    * merge in training order as one narrow projection — K map-only
    * passes, zero shuffles, so at scale encode is embarrassingly
    * parallel (production tokenizers fuse the K merges into a
    * linear-time matcher; the per-merge fold keeps bit-exact parity
    * with training and with the sequential reference).
    */
  def encode(docs: DataFrame, idCol: String, tokCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      docs.select(col(idCol).as("id"), col(tokCol).as("toks"))) {
      case (acc, (l, r)) =>
        acc.select(col("id"), applyMerge(col("toks"), l, r, l + r).as("toks"))
    }

  /** Reference encode (for specs): the same merges applied with the
    * reference left-to-right loop.
    */
  def referenceEncode(docs: Seq[Seq[String]],
      merges: Seq[(String, String)]): Seq[Seq[String]] =
    merges.foldLeft(docs) { case (corpus, (l, r)) =>
      corpus.map { toks =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == l && toks(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
    }

  /** Reference single-node BPE (for specs): identical greedy
    * left-to-right merge and (count desc, pair asc) tiebreak.
    */
  def referenceTrain(docs: Seq[Seq[String]], k: Int)
      : (Seq[(String, String)], Seq[Seq[String]]) = {
    var corpus = docs
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { toks =>
        toks.zip(toks.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best.filter(_._2 >= 2).foreach { case ((l, r), _) =>
        merges += ((l, r))
        corpus = corpus.map { toks =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.size) {
            if (i + 1 < toks.size && toks(i) == l && toks(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toSeq
        }
      }
    }
    (merges.toSeq, corpus)
  }
}
