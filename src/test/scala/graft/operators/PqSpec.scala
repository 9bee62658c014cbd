package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization (graft.operators.Pq): exactness on codeword-
  * aligned vectors (ADC degenerates to the true distance), decode
  * round-trip, recall of trained codebooks against brute force on the
  * embeddings testdata, and partition-invariance of the whole path.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // dim=8, m=2, k=2: vectors 1..2 are the init codewords; 3 and 4 are
  // codeword recombinations, so every vector sits exactly ON the
  // quantization grid.
  private def grid = Seq(
    (1L, Array(0f, 0f, 0f, 0f, 10f, 10f, 10f, 10f)),
    (2L, Array(4f, 4f, 4f, 4f, 20f, 20f, 20f, 20f)),
    (3L, Array(0f, 0f, 0f, 0f, 20f, 20f, 20f, 20f)), // cw(1a)+cw(2b)
    (4L, Array(4f, 4f, 4f, 4f, 10f, 10f, 10f, 10f))  // cw(2a)+cw(1b)
  ).toDF("vec_id", "embedding")

  test("codeword-aligned corpus: decode round-trips, ADC is exact") {
    val cbs = Pq.train(grid, dim = 8, m = 2, k = 2, iters = 0)
    val codes = Pq.encode(grid, dim = 8, cbs)
    // decode(encode(x)) == x for on-grid vectors
    val recon = codes.select(col("n_id"),
        Pq.decode(col("code"), cbs).as("rec"))
      .as[(Long, Seq[Double])].collect().toMap
    val raw = grid.as[(Long, Seq[Float])].collect().toMap
    raw.foreach { case (id, v) =>
      assert(recon(id) == v.map(_.toDouble), s"decode mismatch for $id")
    }
    // ADC distance equals the true squared L2 for on-grid vectors
    val adc = Pq.adcTopK(grid, codes, dim = 8, cbs, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    val vecs = raw.map { case (id, v) => id -> v.map(_.toDouble).toArray }
    adc.foreach { case (q, _, n, d2) =>
      val t = vecs(q).zip(vecs(n)).map { case (a, b) => (a - b) * (a - b) }
        .sum
      assert(math.abs(d2 - t) < 1e-9, s"ADC $d2 != true $t for ($q,$n)")
    }
  }

  test("trained codebooks recall vs brute force on real embeddings") {
    // synthetic near-random embeddings are PQ's worst case (no
    // subspace structure to exploit), so this needs the fine dial:
    // 16 subspaces × 32 codewords. The coarse 8×16 dial measured 0.2
    // recall here — fidelity is a codebook-budget knob, not a bug.
    val cbs = Pq.train(emb, dim = 64, m = 16, k = 32, iters = 2)
    val q = emb.filter($"vec_id" < 10)
    val codes = Pq.encode(emb, dim = 64, cbs)
    val pq = Pq.adcTopK(q, codes, dim = 64, cbs, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // exact L2 ground truth, driver-side (test corpus is tiny)
    val vecs = emb.as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, _) => id -> v.map(_.toDouble).toArray }.toMap
    val exact = (for {
      qid <- vecs.keys.filter(_ < 10)
      (nid, _) <- vecs.toSeq.filter(_._1 != qid)
        .map { case (nid, nv) =>
          nid -> vecs(qid).zip(nv).map { case (a, b) => (a - b) * (a - b) }
            .sum
        }.sortBy { case (nid, d) => (d, nid) }.take(5)
    } yield (qid, nid)).toSet
    // direct ADC on structureless random data: distortion mis-orders
    // close neighbors — this is PQ's documented worst case
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.35, s"direct-ADC recall $recall too low")

    // the production shape (ADC shortlist=50 + exact re-rank) recovers
    // recall: a true neighbor is lost only if it misses the whole
    // shortlist
    val rr = Pq.adcRerankTopK(q, codes, emb, dim = 64, cbs, k = 5,
        shortlist = 50)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val rrRecall = rr.intersect(exact).size.toDouble / exact.size
    assert(rrRecall >= 0.8, s"re-rank recall $rrRecall too low")
  }

  test("ivf-pq composition: probed search finds most re-ranked hits") {
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    val cbs = Pq.train(emb, dim = 64, m = 16, k = 32, iters = 2)
    val q = emb.filter($"vec_id" < 10)
    val full = Pq.adcRerankTopK(q, Pq.encode(emb, dim = 64, cbs), emb,
        dim = 64, cbs, k = 5, shortlist = 50)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivfpq = Pq.ivfPqTopK(q, emb, dim = 64, coarse, cbs, k = 5,
        nprobe = 4, shortlist = 50)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // probing 4 of 8 lists keeps most of the unprobed-everything hits
    val overlap = ivfpq.intersect(full).size.toDouble / full.size
    assert(overlap >= 0.6, s"ivf-pq overlap $overlap too low")
  }

  test("disk ivf-pq index: pruned code scan, identical results") {
    val dir = tmpDir("pqidx")
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    val cbs = Pq.train(emb, dim = 64, m = 16, k = 32, iters = 1)
    Pq.writePqIndex(emb, dim = 64, coarse, cbs, dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("list_id=")) == 8)

    val q = emb.filter($"vec_id" < 5)
    val viaDisk = Pq.searchPqIndex(spark, dir, q, emb, dim = 64,
      coarse, cbs, k = 5, nprobe = 2)
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
      s"expected pruned code-partition read, got $scans")

    val viaMem = Pq.ivfPqTopK(q, emb, dim = 64, coarse, cbs, k = 5,
      nprobe = 2)
    val a = viaDisk.select("q_id", "rank", "n_id")
      .as[(Long, Int, Long)].collect().toSet
    val b = viaMem.select("q_id", "rank", "n_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)

    // append a clone of query 0 under a fresh id: with frozen
    // codebooks it must surface as that query's top hit
    val clone = emb.filter($"vec_id" === 0L)
      .select(lit(90000L).as("vec_id"), $"embedding")
    Pq.appendToPqIndex(clone, dim = 64, coarse, cbs, dir)
    val corpus2 = emb.select($"vec_id", $"embedding").unionByName(clone)
    val after = Pq.searchPqIndex(spark, dir, emb.filter($"vec_id" === 0L),
        corpus2, dim = 64, coarse, cbs, k = 1, nprobe = 2)
      .select("n_id").as[Long].head()
    assert(after == 90000L)
  }

  test("codes and ADC ranks are partition-invariant") {
    val cbs = Pq.train(emb, dim = 64, m = 8, k = 16, iters = 0)
    def run(parts: Int) = Pq.adcTopK(emb.filter($"vec_id" < 5),
        Pq.encode(emb.repartition(parts), dim = 64, cbs), dim = 64,
        cbs, k = 5)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(run(1).sameElements(run(17)))
  }
}
