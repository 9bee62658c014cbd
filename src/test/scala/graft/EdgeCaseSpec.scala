package graft

import org.apache.spark.sql.functions._

import graft.cdc.{CsvSink, Ops, UserRow}
import graft.operators.{Dedup, Similarity}

/** Degenerate-input behavior: empty tables, single rows, empty text —
  * the shapes that show up at partition boundaries of a 100 TB run.
  */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  private val emptyUsers = spark.emptyDataset[UserRow].toDF()

  test("ops on empty input: empty results, no crashes, None watermark") {
    assert(Ops.activeOnly(emptyUsers).count() == 0)
    assert(Ops.withOperation(emptyUsers).count() == 0)
    assert(Ops.maxUpdatedAt(emptyUsers).isEmpty)
    assert(Ops.dedupByEmail(emptyUsers).count() == 0)
  }

  test("csv sink on empty frame writes header-only file") {
    val out = tmpDir("empty-csv") + "/empty.csv"
    val rows = CsvSink.write(Ops.exportProjection(emptyUsers), out)
    assert(rows == 0)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.size == 1 && lines.get(0).startsWith("id,name,email"))
  }

  test("dedup operators on empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDups(empty, "doc_id", "text").count() == 0)
    val single = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(single, "doc_id", "text").count() == 0)
    assert(Dedup.minhashDedup(single, "doc_id", "text").count() == 1)
  }

  test("dedup on empty-string text does not crash") {
    val docs = Seq((1L, ""), (2L, ""), (3L, "real text with actual words in it"))
      .toDF("doc_id", "text")
    // empty texts are trivially identical: signature of the empty
    // shingle set is the empty-fold value on both
    val survivors = Dedup.minhashDedup(docs, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(3L))
    assert(survivors.contains(1L)) // lowest-id empty survives
  }

  test("ann with empty query set returns empty") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val none = emb.filter($"vec_id" < 0)
    assert(Similarity.bruteForceTopK(none, emb, 5).count() == 0)
    assert(Similarity.bruteForceTopKAgg(none, emb, 5).count() == 0)
  }

  test("connected components of empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    // the distributed path agrees on empty input
    assert(Dedup.connectedComponents(empty, driverEdgeLimit = -1L).count() == 0)
  }

  test("curation pipeline on empty and all-filtered corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Curation.curate(empty,
      graft.operators.Curation.Config(keepLangs = Set.empty)).count() == 0)
    // every doc fails the gate -> empty through all later stages
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(graft.operators.Curation.curate(tiny,
      graft.operators.Curation.Config(keepLangs = Set.empty,
        minTokens = 5)).count() == 0)
  }

  test("chunking and packing on degenerate token counts") {
    // single-token and exactly-at-stride docs produce one valid chunk
    val docs = Seq((1L, "one"), (2L, ("w " * 96).trim))
      .toDF("doc_id", "text")
      .withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCount($"text"))
    val chunks = docs.select($"doc_id",
        posexplode(sequence(lit(0),
          greatest(($"n_tokens" - 1).cast("long"), lit(0L)), lit(96L)))
          .as(Seq("chunk_idx", "chunk_start")))
    assert(chunks.filter($"doc_id" === 1L).count() == 1)
    assert(chunks.filter($"doc_id" === 2L).count() == 1)
    // a doc longer than the packing budget still gets a contiguous
    // offset range (spans multiple sequence ids by construction)
    val big = Seq((1L, 600L), (2L, 100L)).toDF("doc_id", "n_tokens")
    val packed = graft.operators.Packing
      .packSequences(big, "n_tokens", "doc_id", budget = 512, shards = 1)
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect()
    assert(packed.map(_._1).toSet == Set(1L, 2L))
    // doc 2 starts at offset 600 -> lands in the second sequence
    val byDoc = packed.map(r => r._1 -> r._2).toMap
    assert(byDoc(2L) == byDoc(1L) + 1)
  }

  test("decontaminate with empty eval set reports zero contamination") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = graft.operators.Decontaminate
      .report(docs, empty, "doc_id", "text", n = 8)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_matched") == 0L)
    assert(!out.head.getAs[Boolean]("contaminated"))
  }

  test("top-k custom operator on empty input returns empty") {
    val empty = Seq.empty[(Long, Double)].toDF("g", "score")
    assert(graft.plans.TopKPerGroup
      .topK(empty, Seq("g"), "score", k = 3).count() == 0)
  }

  test("incremental stats over disjoint keys unions the key space") {
    import graft.operators.IncrementalStats
    val a = IncrementalStats.partials(
      Seq(("x", 1), ("x", 3)).toDF("k", "v"), "k", "v")
    val b = IncrementalStats.partials(
      Seq(("y", 10)).toDF("k", "v"), "k", "v")
    val m = IncrementalStats.merge(a, b).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq(("x", 2L, 4L), ("y", 1L, 10L)))
  }

  test("round-4 operators on empty and single-row inputs") {
    import graft.operators._
    val noPairs = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(Triangles.perNode(noPairs).isEmpty)
    assert(Triangles.perNode(Seq((1L, 2L)).toDF("src", "dst")).isEmpty)
    assert(Bfs.hops(noPairs, Seq(9L).toDF("node"), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((9L, 0)))
    val noDocs = spark.emptyDataset[(Long, Seq[String])].toDF("id", "toks")
    assert(AllPairs.jaccardJoin(noDocs, "id", "toks", 1, 2).isEmpty)
    assert(AllPairs.jaccardJoin(
      Seq((1L, Seq("a"))).toDF("id", "toks"), "id", "toks", 1, 2).isEmpty)
    val noIntervals = spark.emptyDataset[(java.sql.Date, java.sql.Date)]
      .toDF("s", "e")
    assert(IntervalSweep.openCounts(noIntervals, "s", "e",
      d => year(d)).isEmpty)
    val onePoint = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
    assert(Skyline.of(onePoint, Seq(col("x"), col("y"))).count() == 1)
    assert(DetSketch.hllRegisters(
      spark.emptyDataset[Long].toDF("k"), "k").isEmpty)
    assert(DetSketch.kmvBottomK(
      Seq(42L).toDF("k"), "k", 32).count() == 1)
    val (m, c) = BpeTrainer.train(spark,
      spark.emptyDataset[(Long, Seq[String])].toDF("id", "toks"),
      "id", "toks", 3)
    assert(m.isEmpty && c.isEmpty)
  }

  test("z-order of a single row and of equal coordinates") {
    val one = Seq((5L, 9L)).toDF("x", "y")
      .select(graft.sources.ZOrder.mortonCode($"x", $"y").as("z"))
      .collect().head.getLong(0)
    assert(one == ((0x11L /*spread 5*/) | (0x41L /*spread 9*/ << 1)))
    val eq = Seq((7L, 7L)).toDF("x", "y")
      .select(graft.sources.ZOrder.mortonCode($"x", $"y").as("z"))
      .collect().head.getLong(0)
    assert(eq == 0x3fL) // interleave of equal bits -> doubled bits
  }
}
