package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Curation, Packing}
import graft.queries.PipelineQueries

/** Example CLI driving the training-data pipeline end-to-end: raw
  * documents → curation (lang filter, quality gate, exact + near
  * dedup) → PII scrub → chunking → sequence packing → assembled
  * sequences, written as parquet artifacts. Usage:
  *
  *   sbt "runMain graft.tools.PipelineDemo /tmp/pipe-demo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("pipe-demo").toString)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    println(s"[demo] raw docs: ${raw.count()}")

    // 1. curate: lang filter -> quality gate -> exact dedup -> LSH
    //    near-dedup clustering -> stats (unigram space: this corpus's
    //    near-dups are vocabulary-level); funnel counters ride the
    //    pipeline's own jobs (observe/CollectMetrics — no recounts)
    val (curated, funnel) = Curation.curateObserved(raw, Curation.Config(
      keepLangs = Set("en"), minTokens = 5,
      nearDupThreshold = 0.9, nearDupNgram = 1))
    val curatedDir = s"$root/curated"
    curated.write.mode("overwrite").parquet(curatedDir)
    val nCurated = spark.read.parquet(curatedDir).count()
    val f = funnel.counts
    println(s"[demo] curation funnel: in=${f("input")} " +
      s"gated=${f("gated")} exact=${f("exact_deduped")} " +
      s"survivors=$nCurated " +
      f"(mean input chars ${funnel.meanInputChars}%.1f)")
    println(s"[demo] curated survivors: $nCurated")

    // 1b. model-based quality tier (FineWeb-Edu style): train the
    // linear classifier ON the corpus with weak labels from the
    // heuristic gate itself (curation survivors = positive, gated-out
    // = negative), then score the survivors — the composition a real
    // pipeline runs: heuristics bootstrap the model, the model ranks
    val survivorIds = spark.read.parquet(curatedDir)
      .select(col("doc_id")).withColumn("label", lit(1.0))
    val weak = raw.join(survivorIds, Seq("doc_id"), "left")
      .select(col("text"),
        coalesce(col("label"), lit(0.0)).as("label"))
    val model = graft.operators.QualityModel.train(
      weak, "text", "label", iters = 30)
    val sep = weak.withColumn("logit",
      graft.operators.QualityModel.score(model)(col("text")))
      .groupBy(col("label")).agg(avg(col("logit")).as("mean_logit"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // a weak-label class can be EMPTY (e.g. curation gated nothing
    // out): report NaN separation instead of throwing (r11 advice)
    val pos = sep.getOrElse(1.0, Double.NaN)
    val neg = sep.getOrElse(0.0, Double.NaN)
    println(f"[demo] quality model: trained on ${f("input")} weak " +
      f"labels; mean logit survivors=$pos%.2f vs " +
      f"gated-out=$neg%.2f (separated=${pos > neg})")

    // 2. PII scrub (narrow, in place)
    val scrubbed = spark.read.parquet(curatedDir)
      .withColumn("text", PipelineQueries.scrubPii(col("text")))

    // 3. pack into 512-token training sequences, 8 parallel shards
    val packed = Packing.packSequences(
      scrubbed.select(col("doc_id"), col("text"),
        TextFunctions.tokenCount(col("text")).as("n_tokens")),
      "n_tokens", "doc_id", budget = 512, shards = 8)
    val assembled = packed
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          "<|eod|>").as("packed_text"))
    val seqDir = s"$root/sequences"
    assembled.write.mode("overwrite").parquet(seqDir)

    val stats = spark.read.parquet(seqDir)
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("seq_tokens")).as("total_tokens"),
        max(col("seq_tokens")).as("max_seq_tokens"))
      .head()
    println(s"[demo] packed sequences: ${stats.getLong(0)} " +
      s"totalTokens=${stats.getLong(1)} maxSeqTokens=${stats.getLong(2)}")

    // 4. steady state: index the curated corpus once, then curate a
    //    NEW ingest batch incrementally — near-dups against the index
    //    (and within the batch) drop at O(batch) cost
    val idxDir = s"$root/lsh-index"
    graft.operators.Dedup.writeLshIndex(
      spark.read.parquet(curatedDir), "doc_id", "text", idxDir, ngram = 1)
    val newBatch = spark.read.parquet(curatedDir)
      .limit(20) // replay some curated docs as a "new" crawl drop...
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang")) // ...under fresh ids: all should dedup away
      .unionByName(spark.range(1).select(
        lit(2000000L).as("doc_id"),
        lit("a genuinely novel document about nothing seen before today")
          .as("text"),
        lit("en").as("lang")))
    val incremental = Curation.curateIncremental(newBatch, idxDir,
      Curation.Config(keepLangs = Set("en"), minTokens = 5,
        nearDupThreshold = 0.9, nearDupNgram = 1))
    println(s"[demo] incremental batch: ${newBatch.count()} in -> " +
      s"${incremental.count()} survivors (replayed dups dropped)")

    println(s"[demo] artifacts: $curatedDir  $seqDir  $idxDir")
    spark.stop()
  }
}
