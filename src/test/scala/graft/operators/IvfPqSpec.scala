package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ composed search (Pq.ivfPqTopK / writePqIndex): recall
  * against exact L2 ground truth — the acceptance test of any ANN
  * build — decomposed so each lossy stage is measured on its own:
  * exhaustive probes isolate shortlist+code fidelity, partial probes
  * measure pure probe loss, and widening the probe dial must be
  * monotone.
  */
class IvfPqSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("disk index is compact: one code row per vector, no embeddings") {
    val dir = tmpDir("ivfpq-idx")
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    val cbs = Pq.train(emb, dim = 64, m = 8, k = 16, iters = 0)
    Pq.writePqIndex(emb, dim = 64, coarse, cbs, dir)
    val idx = spark.read.parquet(dir)
    assert(idx.columns.toSet == Set("n_id", "code", "list_id"))
    assert(idx.count() == emb.count())
    val bad = idx.filter(size($"code") =!= 8 ||
      exists($"code", c => c < 0 || c >= 16) ||
      $"list_id" < 0 || $"list_id" >= 8).count()
    assert(bad == 0L)
  }

  test("recall@10 vs exact L2 clears the quantized-search bar") {
    // the search ranks by SQUARED L2 (ADC shortlist, exact re-rank),
    // so the ground truth is exact L2 top-k — recall vs a cosine
    // truth would conflate metric disagreement on un-normalized
    // vectors with quantization loss
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter($"vec_id" < 20)
    val k = 10
    val exact = q.select($"vec_id".as("q_id"), $"embedding".as("qe"))
      .crossJoin(emb.select($"vec_id".as("n_id"), $"embedding".as("ne")))
      .filter($"n_id" =!= $"q_id")
      .withColumn("d2", aggregate(
        zip_with($"qe", $"ne", (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // trained codebooks at the fine 16×32 budget — synthetic
    // near-random embeddings are PQ's worst case (no subspace
    // structure to exploit; PqSpec pins the coarse 8×16 dial at ~0.2)
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    val cbs = Pq.train(emb, dim = 64, m = 16, k = 32, iters = 2)
    def recallAt(nprobe: Int): Double = {
      val approx = Pq.ivfPqTopK(q, emb, dim = 64, coarse, cbs, k,
          nprobe = nprobe, shortlist = 50)
        .select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      rs.sum / rs.size
    }
    // exhaustive probes isolate the shortlist+code stage: re-rank
    // recovers what quantization mis-ordered (loss only when a true
    // neighbor misses the whole 50-wide shortlist)
    val rAll = recallAt(8)
    assert(rAll >= 0.8, f"exhaustive-probe re-rank recall = $rAll%.3f")
    // partial probes measure pure probe loss: this corpus is
    // near-random, so neighbors spread ~uniformly over the 8 lists
    // and recall tracks the probed fraction (6/8)
    val r6 = recallAt(6)
    assert(r6 >= 0.6, f"re-rank recall at nprobe=6 = $r6%.3f below bar")
    assert(rAll >= r6, "widening probes lost recall")
  }

  test("residual encoding vs a zero centroid is exactly the raw path") {
    // with ONE all-zero coarse centroid, v − centroid(v) = v, so the
    // residual pipeline (train/encode/LUT/search) must reproduce the
    // raw pipeline bit-for-bit — the exactness anchor that pins the
    // residual arithmetic without a second source of truth
    val q = emb.filter($"vec_id" < 10)
    val zero = Seq(Array.fill(64)(0.0))
    val cbsRaw = Pq.train(emb, dim = 64, m = 8, k = 16, iters = 0)
    val cbsRes = Pq.trainResidual(emb, dim = 64, zero, m = 8, k = 16,
      iters = 0)
    assert(cbsRes.map(_.map(_.toSeq)) == cbsRaw.map(_.map(_.toSeq)))
    val raw = Pq.ivfPqTopK(q, emb, dim = 64, zero, cbsRaw, k = 5,
        nprobe = 1, shortlist = 50)
      .select($"q_id", $"rank", $"n_id").as[(Long, Int, Long)]
      .collect().toSet
    val res = Pq.ivfPqResidualTopK(q, emb, dim = 64, zero, cbsRes,
        k = 5, nprobe = 1, shortlist = 50)
      .select($"q_id", $"rank", $"n_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(res == raw)
  }

  test("residual encoding holds the recall bar of the raw form") {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter($"vec_id" < 20)
    val k = 10
    val exact = q.select($"vec_id".as("q_id"), $"embedding".as("qe"))
      .crossJoin(emb.select($"vec_id".as("n_id"), $"embedding".as("ne")))
      .filter($"n_id" =!= $"q_id")
      .withColumn("d2", aggregate(
        zip_with($"qe", $"ne", (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      rs.sum / rs.size
    }
    val cbsRes = Pq.trainResidual(emb, dim = 64, coarse, m = 16, k = 32,
      iters = 2)
    val rRes = recallOf(Pq.ivfPqResidualTopK(q, emb, dim = 64, coarse,
      cbsRes, k, nprobe = 6, shortlist = 50))
    // same budget/bars as the raw form's partial-probe leg: residual
    // encoding must never LOSE recall (on this structureless corpus
    // the coarse partition captures little, so big gains aren't
    // expected either — the win shows up when lists are tight)
    assert(rRes >= 0.6, f"residual re-rank recall@$k = $rRes%.3f")
  }

  test("more probes never shrink the exhaustive-agreement set") {
    val q = emb.filter($"vec_id" < 10)
    val coarse = Ivf.train(emb, nlist = 8, iters = 1)
    val cbs = Pq.train(emb, dim = 64, m = 8, k = 16, iters = 0)
    def hits(nprobe: Int): Map[Long, Set[Long]] =
      Pq.ivfPqTopK(q, emb, dim = 64, coarse, cbs, k = 5,
          nprobe = nprobe, shortlist = 50)
        .select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val h2 = hits(2); val h8 = hits(8)
    val agree2 = h2.map { case (qid, s) => s.intersect(h8(qid)).size }.sum
    val total8 = h8.map { case (_, s) => s.size }.sum
    assert(agree2 <= total8)
    assert(h8.values.forall(_.size == 5))
  }
}
