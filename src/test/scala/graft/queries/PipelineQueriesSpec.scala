package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("pii scrub redacts emails, phones, and ipv4s; clean text untouched") {
    val r = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org today"),
      (2L, "call 555-0142 or visit 192.168.1.20 now"),
      (3L, "nothing sensitive here"),
    ).toDF("id", "text")
      .select($"id", PipelineQueries.scrubPii($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "mail me at <EMAIL> today")
    assert(r(2L) == "call <PHONE> or visit <IP> now")
    assert(r(3L) == "nothing sensitive here")
  }

  test("trigram repetition: repeated text scores high, varied text zero") {
    val r = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight distinct words never repeating at all here"),
      (3L, "ab cd"), // below trigram length -> empty, ratio 0
    ).toDF("doc_id", "text")
      .select($"doc_id", PipelineQueries.trigrams($"text").as("tg"))
      .withColumn("dup_ratio",
        when(size($"tg") > 0,
          lit(1.0) - size(array_distinct($"tg")).cast("double") / size($"tg"))
          .otherwise(lit(0.0)))
      .select($"doc_id", $"dup_ratio")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.8) // 6 windows, 1 distinct
    assert(r(2L) == 0.0)
    assert(r(3L) == 0.0)
  }

  test("md5 stratified sample is deterministic and ~40/256 of the corpus") {
    val docs = (0L until 2000L).map(i => (i, s"lang${i % 3}"))
      .toDF("doc_id", "lang")
    def sampledIds = docs
      .filter(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2)
        < "28")
      .select("doc_id").as[Long].collect().toSet
    val once = sampledIds
    assert(sampledIds == once) // reproducible, no rand()
    val rate = once.size.toDouble / 2000
    assert(rate > 0.10 && rate < 0.22, s"rate $rate far from 40/256")
  }

  test("int8 quantization: reconstruction error bounded by half a step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = PipelineQueries.queries("embed_quantize")(spark,
      "/root/testdata/sf0.001")
      // half a quantization step is 0.5/scale; allow float->double slack
      .filter($"scale" > 0 && $"max_abs_err" > lit(0.5000001) / $"scale")
      .count()
    assert(bad == 0)
    assert(emb.count() > 0)
  }

  test("chunking: windows cover every token, strides overlap, lengths bounded") {
    val chunks = PipelineQueries.queries("chunk_documents")(spark,
      "/root/testdata/sf0.001")
      .as[(Long, Int, Long, Long)].collect()
    assert(chunks.nonEmpty)
    // every chunk is 1..128 tokens and starts on a stride boundary
    assert(chunks.forall { case (_, i, start, len) =>
      len >= 1 && len <= 128 && start == i * 96L })
    // per doc: chunks tile the doc — last chunk reaches the final token
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.values.forall { cs =>
      val sorted = cs.sortBy(_._2)
      sorted.head._3 == 0L &&
        sorted.zipWithIndex.forall { case ((_, i, _, _), j) => i == j }
    })
  }

  test("mix by source: budget respected, selection deterministic") {
    val r = PipelineQueries.queries("mix_by_source")(spark,
      "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    // selected token mass never exceeds the 4000 budget, and something
    // is selected for every source with any tokens
    assert(r.forall { case (_, _, total, nSel, selTok) =>
      selTok <= 4000L && (total == 0 || nSel >= 1) })
    val again = PipelineQueries.queries("mix_by_source")(spark,
      "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.toSeq == again.toSeq)
  }

  test("int8 quantization preserves ANN ranking: dequantized top-k ≈ exact") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = col("embedding")
    val absmax = array_max(transform(e, x => abs(x.cast("double"))))
    val deq = emb.withColumn("scale",
        when(absmax > 0, lit(127.0) / absmax).otherwise(lit(0.0)))
      .withColumn("embedding",
        transform(e, x =>
          (round(x.cast("double") * col("scale")) / col("scale"))
            .cast("float")))
      .select("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val viaQuant = Similarity.bruteForceTopK(q, deq, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = viaQuant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall too low")
  }

  test("tfidf: rare term in one doc outranks ubiquitous term") {
    val dir = tmpDir("tfidf")
    Seq(
      (1L, "common words and unique zyzzyva here"),
      (2L, "common words and more common words"),
      (3L, "common words and anything else common"),
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = PipelineQueries.queries("text_tfidf_top")(spark, dir)
      .select("term", "tfidf_scaled").as[(String, Long)].collect()
    val score = top.toMap
    assert(score("zyzzyva") > score.getOrElse("common", 0L))
  }
}
