package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot
import graft.functions.CosineSimilarityExpr.cosineSim

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *    set against the partitioned corpus; per-partition TakeOrdered then
  *    k-merge. Correctness baseline, and the right plan whenever
  *    |queries| is broadcast-sized.
  *  - `lshTopK`: random-hyperplane LSH (Charikar 2002 SimHash for
  *    angular distance) — corpus bucketed once by a `numPlanes`-bit
  *    signature; queries probe their own bucket plus all 1-bit-flip
  *    neighbors (multi-probe). Exact cosine is computed only on probed
  *    buckets (~ (numPlanes+1)/2^numPlanes of the corpus), which is the
  *    100 TB path: the bucketed corpus is write-once, probes shuffle
  *    only candidate rows.
  *
  * Hyperplanes are seeded pseudo-random literals compiled into the
  * plan — identical across runs and executors, no driver state.
  */
object Similarity {

  /** Deterministic random hyperplanes: `numPlanes` × `dim` gaussians.
    * Package-visible so oracle SQL can embed the exact plane values as
    * literals (the planes are seeded constants, not data).
    */
  private[graft] def planes(numPlanes: Int, dim: Int,
      seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH signature: bit i = (emb · plane_i) > 0, packed into an int.
    * The plane table is ONE nested-array literal folded by `aggregate`,
    * not `numPlanes` unrolled dot products — the unrolled form generates
    * O(numPlanes·dim) code whose compile time dominates at small scale.
    */
  def signature(emb: Column, numPlanes: Int = 12, dim: Int = 64,
      seed: Long = 42L): Column = {
    // the signature packs one bit per plane into a 32-bit int (and
    // multi-probe flips ride 32-bit shifts): past 31 planes the pow
    // cast overflows and distinct outcomes silently collapse onto the
    // same bucket
    require(numPlanes <= 31, s"numPlanes must be <= 31, got $numPlanes")
    val ps = typedlit(planes(numPlanes, dim, seed).map(_.toSeq))
    aggregate(
      zip_with(ps, sequence(lit(0), lit(numPlanes - 1)),
        (p, i) => when(dot(emb, p) > 0,
          pow(lit(2.0), i).cast("int")).otherwise(lit(0))),
      lit(0), (acc, b) => acc + b)
  }

  /** Exact brute-force cosine top-k per query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qEmb).as("q_emb"))
    val c = corpus.select(col(cId).as("n_id"), col(cEmb).as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).crossJoin(c)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** Brute-force top-k via the k-bounded TopK aggregate instead of a
    * window rank: map-side partial keeps k rows per query per
    * partition, so the shuffle carries |Q|·k·partitions rows instead
    * of the full |Q|·|corpus| scored set. Identical output contract
    * to `bruteForceTopK` (same (score desc, id asc) order).
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qEmb).as("q_emb"))
    val c = corpus.select(col(cId).as("n_id"), col(cEmb).as("n_emb"))
    broadcast(q).crossJoin(c)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineSim(col("q_emb"), col("n_emb")))
      .groupBy(col("q_id"))
      .agg(TopK.topKUdaf(k)(col("cos"), col("n_id")).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "entry")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("entry._2").as("n_id"), col("entry._1").as("cos"))
  }

  /** Multi-probe, multi-table LSH top-k: `numTables` independent
    * hyperplane tables (classic OR-amplification — a true neighbor is
    * missed only if it separates from the query in EVERY table), each
    * probed at the query's bucket and every 1-bit flip of it; exact
    * cosine over the unioned candidate set only. Approximate — recall
    * rises with more tables, fewer planes, or more probes.
    *
    * At 100 TB the bucketed corpus is `numTables` write-once sorted
    * copies (or one table with a `table` partition column); probes
    * shuffle candidate rows only.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int = 12, dim: Int = 64, seed: Long = 42L,
      numTables: Int = 4,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    def sigs(emb: Column): Column = array((0 until numTables).map(t =>
      signature(emb, numPlanes, dim, seed + 131L * t)): _*)
    val bucketed = corpus.select(col(cId).as("n_id"), col(cEmb).as("n_emb"),
      posexplode(sigs(col(cEmb))).as(Seq("table", "bucket")))
    val probeOffsets = lit(0) +: (0 until numPlanes).map(i => lit(1 << i))
    val probed = queries
      .select(col(qId).as("q_id"), col(qEmb).as("q_emb"),
        posexplode(sigs(col(qEmb))).as(Seq("table", "sig")))
      .withColumn("flip", explode(array(probeOffsets: _*)))
      .withColumn("bucket", col("sig").bitwiseXOR(col("flip")))
      .select(col("q_id"), col("q_emb"), col("table"), col("bucket"))
    // a pair can collide in several tables/probes — dedup before scoring
    // so the rank sees each candidate once
    val cands = broadcast(probed).join(bucketed, Seq("table", "bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(first(col("q_emb")).as("q_emb"), first(col("n_emb")).as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cands
      .withColumn("cos", cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }
}
