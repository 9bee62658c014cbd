package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup}

/** Ad-hoc stage profiler for the heavy bench queries: times each phase
  * of the curation pipeline separately so optimization effort goes where
  * the seconds are. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-profile")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val cfg = Curation.Config(keepLangs = Set("en"), minTokens = 5,
      nearDupThreshold = 0.9, nearDupNgram = 1)
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"), col("lang"))

    time("warm (count docs)")(docs.count())

    val langFiltered = TextFunctions.withLangScores(docs)
      .filter(col("predicted_lang").isin("en"))
      .select(docs.columns.toSeq.map(col): _*)
    val gated = langFiltered.filter(Curation.qualityGate(col("text"), cfg))
    time("lang+gate")(gated.count())

    val hashed = gated.withColumn("__fp", md5(TextFunctions.normalize(col("text"))))
    val exact = hashed.groupBy(col("__fp"))
      .agg(min_by(struct(gated.columns.toSeq.map(col): _*), col("doc_id")).as("r"))
      .select(gated.columns.toSeq.map(c => col(s"r.$c")): _*)
      .persist()
    time("exact dedup")(exact.count())

    val cands = time("lsh candidates (build)")(
      Dedup.lshCandidatePairs(exact, "doc_id", "text", ngram = cfg.nearDupNgram))
    val nCands = time("lsh candidates (run)")(cands.count())
    println(s"[profile] lsh candidates: $nCands")

    // ground truth: all-pairs word-set jaccard on the survivor slice
    val ws = exact.select(col("doc_id"),
      array_distinct(Dedup.features(col("text"), cfg.nearDupNgram)).as("w"))
    val truth = ws.as("a").join(ws.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("j",
        size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
          size(array_union(col("a.w"), col("b.w"))))
      .filter(col("j") >= cfg.nearDupThreshold)
      .count()
    println(s"[profile] true pairs >= ${cfg.nearDupThreshold}: $truth")

    val pairs = Dedup.minhashNearDups(exact, "doc_id", "text", cfg.nearDupThreshold, ngram = cfg.nearDupNgram)
      .select("id_a", "id_b").persist()
    val nPairs = time("verified pairs")(pairs.count())
    println(s"[profile] verified pairs: $nPairs")

    val cc = time("connected components (run)")(
      Dedup.connectedComponents(pairs).count())
    println(s"[profile] cc labels: $cc")

    val full = time("curate end-to-end")(
      Curation.curate(docs, cfg).count())
    println(s"[profile] survivors: $full")

    // native-vs-declarative kernel micro-bench over the full SF corpus
    val corpus = Tables.documents(spark, sfDir).repartition(col("doc_id"))
      .select(col("doc_id"), col("text")).persist()
    corpus.count() // materialize outside the timers
    def evalAll(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    time("rolling_fp native")(evalAll(corpus.select(
      graft.functions.RollingHashExpr.rollingFp(col("text")))))
    time("rolling_fp declarative")(evalAll(corpus.select(
      TextFunctions.rollingHashFromCodes(
        TextFunctions.charCodes(col("text"))))))
    val th = corpus.withColumn("th", Dedup.tokenHashes(col("text"))).persist()
    th.count()
    time("simhash native")(evalAll(th.select(
      graft.functions.SimHashExpr.simhash64(col("th")))))
    time("simhash declarative")(evalAll(th.select(
      Dedup.simhashFromHashes(col("th")))))
    val xs = corpus.withColumn("xs",
      Dedup.featureHashesModP(col("text"), ngram = 1)).persist()
    xs.count()
    time("minhash native")(evalAll(xs.select(
      graft.functions.MinHashExpr.minhash(col("xs")))))
    time("minhash declarative")(evalAll(xs.select(
      Dedup.minhashFromHashes(col("xs")))))
    spark.stop()
  }
}
