package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfTopKSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("topk aggregate matches window-rank formulation exactly") {
    val q = emb.filter($"vec_id" < 5)
    val viaWindow = Similarity.bruteForceTopK(q, emb, k = 7)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().toSet
    val viaAgg = Similarity.bruteForceTopKAgg(q, emb, k = 7)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().toSet
    assert(viaWindow == viaAgg)
  }

  test("ivf: training converges to nlist centroids, assignment is total") {
    val cents = Ivf.train(emb, nlist = 8, iters = 2)
    assert(cents.length == 8)
    assert(cents.forall(_.length == 64))
    val assigned = Ivf.index(emb, cents)
    assert(assigned.count() == emb.count())
    val lists = assigned.select("list_id").distinct().as[Int].collect()
    assert(lists.forall(l => l >= 0 && l < 8))
  }

  test("disk index: partition-pruned probes, same results as in-memory") {
    val dir = tmpDir("ivfidx")
    val cents = Ivf.train(emb, nlist = 8, iters = 2)
    Ivf.writeIndex(emb, cents, dir)
    // one partition directory per list
    val listDirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("list_id="))
    assert(listDirs == 8)

    val q = emb.filter($"vec_id" < 5)
    val viaDisk = Ivf.searchIndex(dir, q, cents, k = 5, nprobe = 2)
    // the scan must read only the probed lists' partitions (descend
    // through the AQE wrapper to reach the real scan node)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val self = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case other => Seq(other)
      }
      self ++ p.children.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes)
    }
    val scans = allNodes(viaDisk.queryExecution.executedPlan)
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scans.exists(n => n > 0 && n < 8),
      s"expected pruned partition read, got $scans")

    // and results match scoring the same probes against the in-memory
    // index (searchIndex must not change semantics, only I/O) — train
    // is deterministic, so ivfTopK re-derives the identical centroids
    val viaMem = Ivf.ivfTopK(q, emb, k = 5, nlist = 8, nprobe = 2, iters = 2)
    val a = viaDisk.select("q_id", "rank", "n_id")
      .as[(Long, Int, Long)].collect().toSet
    val b = viaMem.select("q_id", "rank", "n_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("append to disk index: new vectors searchable, old lists untouched") {
    val dir = tmpDir("ivfappend")
    val cents = Ivf.train(emb, nlist = 8, iters = 2)
    Ivf.writeIndex(emb, cents, dir)

    // append an exact copy of query vector 3 under a fresh id — after
    // the append it must surface as that query's top neighbor (cos=1)
    val clone = emb.filter($"vec_id" === 3)
      .select(lit(900001L).as("vec_id"), $"embedding", $"label")
    Ivf.appendToIndex(clone, cents, dir)

    val q = emb.filter($"vec_id" === 3)
    val hits = Ivf.searchIndex(dir, q, cents, k = 3, nprobe = 2)
      .select("rank", "n_id").as[(Int, Long)].collect().toMap
    assert(hits(1) == 900001L, hits.toString)
  }

  test("ivf topk: high recall vs exact brute force") {
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.ivfTopK(q, emb, k = 5, nlist = 8, nprobe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
    // probing all lists must be exhaustive = exact
    val full = Ivf.ivfTopK(q, emb, k = 5, nlist = 8, nprobe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }
}
