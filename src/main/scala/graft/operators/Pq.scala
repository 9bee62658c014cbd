package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each `dim` vector into
  * `m` contiguous subvectors, learn a tiny k-codeword codebook per
  * subspace, and store each vector as `m` small codes. Search runs in
  * ADC (asymmetric distance computation): per query, precompute an
  * m×k lookup table of exact subspace distances, then a candidate's
  * approximate distance is just m table lookups summed — no float
  * vector math per candidate.
  *
  * This is the memory-scale path of the ANN suite: IVF prunes WHICH
  * vectors to score, PQ shrinks WHAT is stored/scored (64 floats →
  * m bytes per vector, a 32× compression at m=8). At 100 TB the
  * encoded corpus is the only big table left; codebooks are m·k·subDim
  * doubles — always a broadcast literal. Composing the two (IVF-PQ) is
  * `Ivf.index` on the codes frame.
  *
  * Determinism: training reuses `Ivf.train` per subspace (lowest-id
  * init, first-minimum assignment), distances fold sequentially low
  * dimension → high, and the ADC sum folds subspaces in order 0→m-1 —
  * so results are bit-identical across engines and partitionings, and
  * a SQL oracle can replay encode+search exactly.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j, length dim/m. */
  type Codebooks = Seq[Seq[Array[Double]]]

  private def subDim(dim: Int, m: Int): Int = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    dim / m
  }

  /** Train one codebook per subspace (Lloyd via `Ivf.train`, which is
    * deterministic; `iters = 0` keeps the lowest-id init codewords —
    * the oracle-friendly degenerate quantizer).
    */
  def train(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Codebooks = {
    val d = subDim(dim, m)
    if (iters == 0) {
      // init-only codebooks are the k lowest-id vectors' slices — ONE
      // k-row collect sliced driver-side, not m sort+limit jobs (the
      // per-subspace Ivf.train path cost 8 identical tiny jobs here,
      // the dominant fixed cost of the oracle-deterministic PQ queries)
      val init = corpus.select(col(idCol), col(embCol))
        .orderBy(col(idCol)).limit(k)
        .select(col(embCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      (0 until m).map(j =>
        init.map(v => v.slice(j * d, (j + 1) * d)).toSeq)
    } else (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(embCol), j * d + 1, d).as(embCol))
      Ivf.train(sub, nlist = k, iters = iters, idCol = idCol, embCol = embCol)
    }
  }

  /** Encode each vector as its `m` nearest-codeword ids (int array). */
  def encode(corpus: DataFrame, dim: Int, cbs: Codebooks,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val m = cbs.size
    val d = subDim(dim, m)
    corpus.select(col(idCol).as("n_id"),
      array(cbs.indices.map(j =>
        Ivf.assignment(slice(col(embCol), j * d + 1, d), cbs(j))): _*)
        .as("code"))
  }

  /** Reconstruction of a code array (codeword concatenation) — for
    * audits of the quantization error the codes carry.
    */
  def decode(codeCol: Column, cbs: Codebooks): Column = {
    val cb = typedlit(cbs.map(_.map(_.toSeq)))
    flatten(zip_with(cb, codeCol, (cbj, c) => element_at(cbj, c + 1)))
  }

  /** ADC top-k: exact subspace-distance lookup tables per query, then
    * each candidate costs m lookups. Queries broadcast (they are the
    * small side); the encoded corpus never moves except the final
    * k-rank shuffle on q_id.
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, dim: Int,
      cbs: Codebooks, k: Int,
      qId: String = "vec_id", qEmb: String = "embedding"): DataFrame = {
    val m = cbs.size
    val d = subDim(dim, m)
    val cb = typedlit(cbs.map(_.map(_.toSeq)))
    // lut(j)(c) = ‖q_sub_j − codeword_c‖² , folded low→high dim
    val q = queries.select(col(qId).as("q_id"),
      transform(cb, (cbj, j) =>
        transform(cbj, cent =>
          aggregate(
            zip_with(slice(col(qEmb), j * lit(d) + 1, lit(d)), cent, (x, y) => {
              val diff = x.cast("double") - y
              diff * diff
            }),
            lit(0.0), (acc, v) => acc + v))).as("lut"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2"), col("n_id"))
    broadcast(q).crossJoin(codes)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adc_d2",
        aggregate(zip_with(col("lut"), col("code"),
          (l, c) => element_at(l, c + 1)), lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("adc_d2"))
  }

  /** ADC shortlist + exact re-rank — the production PQ search shape:
    * the quantized pass prunes the corpus to `shortlist` candidates
    * per query (cheap, code-only), then ONLY those rows' raw vectors
    * are fetched (join on n_id) and re-ranked by true L2. Quantization
    * distortion then costs recall only when a true neighbor misses the
    * whole shortlist, not whenever codes mis-order two close hits. At
    * scale the raw-vector fetch touches |Q|·shortlist rows of the
    * vector store, never the corpus.
    */
  def adcRerankTopK(queries: DataFrame, codes: DataFrame,
      corpus: DataFrame, dim: Int, cbs: Codebooks, k: Int,
      shortlist: Int = 50,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val cand = adcTopK(queries, codes, dim, cbs, shortlist, qId, qEmb)
      .select(col("q_id"), col("n_id"))
    val q = queries.select(col(qId).as("q_id"), col(qEmb).as("q_emb"))
    val c = corpus.select(col(cId).as("n_id"), col(cEmb).as("n_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2"), col("n_id"))
    cand.join(broadcast(q), Seq("q_id")).join(c, Seq("n_id"))
      .withColumn("d2",
        aggregate(zip_with(col("q_emb"), col("n_emb"), (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }), lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("d2"))
  }

  /** IVF-PQ: the two scale levers composed — the coarse quantizer
    * prunes WHICH lists are scored (`nprobe` of `nlist`), PQ codes
    * shrink WHAT each candidate costs (m lookups). The probe is an
    * equi-join on list_id against the coded corpus (partition the
    * codes frame by list_id on disk — `Ivf.writeIndex` layout — and
    * the scan prunes too), then ADC ranks within the probed lists and
    * the exact re-rank fetches only the shortlist's raw vectors.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks, k: Int, nprobe: Int,
      shortlist: Int = 50,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val codes = codesWithList(corpus, dim, coarse, cbs, cId, cEmb)
    val probes = probeLists(queries, coarse, nprobe, qId, qEmb)
    ivfPqFromCodes(probes, codes, probes, corpus, dim, cbs, k,
      shortlist, cId, cEmb)
  }

  /** PQ code + coarse-list assignment in ONE corpus pass: both are
    * row-local projections of the same row, so joining `encode` with
    * `Ivf.index` on n_id (two scans + a corpus-wide shuffle to glue
    * two projections back together) is pure waste at index-build
    * scale.
    */
  private def codesWithList(corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks,
      cId: String, cEmb: String): DataFrame = {
    val m = cbs.size
    val d = subDim(dim, m)
    corpus.select(col(cId).as("n_id"),
      array(cbs.indices.map(j =>
        Ivf.assignment(slice(col(cEmb), j * d + 1, d), cbs(j))): _*)
        .as("code"),
      Ivf.assignment(col(cEmb), coarse).as("list_id"))
  }

  // ---- residual encoding (FAISS `IVFx,PQy` default): codes quantize
  // v − centroid(v), which concentrates what PQ must represent around
  // the origin of each list — tighter at the same bit budget whenever
  // the coarse partition captures structure. Residuals round to FLOAT
  // (the corpus's own element type) so training, encoding and the
  // query-side LUT all quantize the identical values deterministically.

  /** `emb − coarse(listId)`, float-rounded elementwise. */
  private def residualOf(emb: Column, listId: Column,
      coarse: Seq[Array[Double]]): Column =
    zip_with(emb,
      element_at(typedlit(coarse.map(_.toSeq)), listId + 1),
      (x, c) => (x.cast("double") - c).cast("float"))

  /** Train per-subspace codebooks over the RESIDUALS (same
    * deterministic Lloyd as [[train]]).
    */
  def trainResidual(corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Codebooks =
    train(corpus.select(col(idCol),
        residualOf(col(embCol), Ivf.assignment(col(embCol), coarse), coarse)
          .as(embCol)),
      dim, m, k, iters, idCol, embCol)

  /** Residual codes + list assignment in one corpus pass (the
    * residual twin of [[codesWithList]]).
    */
  private def residualCodesWithList(corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks,
      cId: String, cEmb: String): DataFrame = {
    val m = cbs.size
    val d = subDim(dim, m)
    corpus
      .select(col(cId).as("n_id"), col(cEmb).as("__e"),
        Ivf.assignment(col(cEmb), coarse).as("list_id"))
      .select(col("n_id"), col("list_id"),
        array(cbs.indices.map(j =>
          Ivf.assignment(
            slice(residualOf(col("__e"), col("list_id"), coarse),
              j * d + 1, d), cbs(j))): _*).as("code"))
  }

  /** Residual IVF-PQ search: identical plan shape to [[ivfPqTopK]] —
    * the only difference is that each (query, probed list) row
    * residualizes the query against THAT list's centroid before the
    * LUT, matching how the candidates in the list were encoded; the
    * exact re-rank still uses the original vectors.
    */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks, k: Int, nprobe: Int,
      shortlist: Int = 50,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val codes = residualCodesWithList(corpus, dim, coarse, cbs, cId, cEmb)
    val probes = probeLists(queries, coarse, nprobe, qId, qEmb)
      .withColumn("q_emb", residualOf(col("q_emb"), col("list_id"), coarse))
    ivfPqFromCodes(probes, codes,
      queries.select(col(qId).as("q_id"), col(qEmb).as("q_emb")),
      corpus, dim, cbs, k, shortlist, cId, cEmb)
  }

  /** Disk IVF-PQ index: (n_id, code) rows partitioned by coarse list —
    * the PQ-compressed twin of [[Ivf.writeIndex]] (raw vectors stay in
    * the corpus table; the scanned index is m bytes-ish per vector).
    */
  def writePqIndex(corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks, dir: String,
      cId: String = "vec_id", cEmb: String = "embedding"): Unit =
    codesWithList(corpus, dim, coarse, cbs, cId, cEmb)
      .write.partitionBy("list_id").mode("overwrite").parquet(dir)

  /** Append a new vector batch to a [[writePqIndex]] disk index with
    * FROZEN codebooks and coarse centroids (retraining both is a
    * periodic offline job, as in any deployed IVF-PQ): encode + assign
    * the batch only, append to the per-list partitions — O(batch),
    * existing code files untouched.
    */
  def appendToPqIndex(newVecs: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks, dir: String,
      cId: String = "vec_id", cEmb: String = "embedding"): Unit =
    codesWithList(newVecs, dim, coarse, cbs, cId, cEmb)
      .write.partitionBy("list_id").mode("append").parquet(dir)

  /** IVF-PQ over a disk index from [[writePqIndex]]: the queries'
    * probed-list union becomes an `isin` over the partition column —
    * partition pruning reads only those lists' code files (the
    * probed set is nlist-bounded, driver-tiny). ADC scores the pruned
    * codes; the exact re-rank touches raw vectors only for the
    * shortlist.
    */
  def searchPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, corpus: DataFrame, dim: Int,
      coarse: Seq[Array[Double]], cbs: Codebooks, k: Int, nprobe: Int,
      shortlist: Int = 50,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val probes = probeLists(queries, coarse, nprobe, qId, qEmb)
    val probed = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val codes = spark.read.parquet(indexDir)
      .filter(col("list_id").isin(probed.map(Integer.valueOf): _*))
    ivfPqFromCodes(probes, codes, probes, corpus, dim, cbs, k,
      shortlist, cId, cEmb)
  }

  /** nprobe nearest coarse lists per query (queries are the tiny side). */
  private def probeLists(queries: DataFrame, coarse: Seq[Array[Double]],
      nprobe: Int, qId: String, qEmb: String): DataFrame = {
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cd"), col("list_id"))
    queries
      .select(col(qId).as("q_id"), col(qEmb).as("q_emb"),
        posexplode(Ivf.distances(col(qEmb), coarse))
          .as(Seq("list_id", "cd")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("list_id"))
  }

  private def ivfPqFromCodes(probes: DataFrame, codes: DataFrame,
      rerankQueries: DataFrame, corpus: DataFrame, dim: Int,
      cbs: Codebooks, k: Int,
      shortlist: Int, cId: String, cEmb: String): DataFrame = {
    val m = cbs.size
    val d = subDim(dim, m)
    val cb = typedlit(cbs.map(_.map(_.toSeq)))
    val q = probes.withColumn("lut",
      transform(cb, (cbj, j) =>
        transform(cbj, cent =>
          aggregate(
            zip_with(slice(col("q_emb"), j * lit(d) + 1, lit(d)), cent,
              (x, y) => {
                val diff = x.cast("double") - y
                diff * diff
              }),
            lit(0.0), (acc, v) => acc + v))))
    val adcW = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2"), col("n_id"))
    val cand = broadcast(q).join(codes, Seq("list_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adc_d2",
        aggregate(zip_with(col("lut"), col("code"),
          (l, c) => element_at(l, c + 1)), lit(0.0), (acc, v) => acc + v))
      .withColumn("pr", row_number().over(adcW))
      .filter(col("pr") <= shortlist)
      .select(col("q_id"), col("n_id"))
    // exact re-rank of the shortlist against the ORIGINAL query
    // vectors (probe rows may carry per-list residualized copies)
    val qv = rerankQueries.select(col("q_id"), col("q_emb")).distinct()
    val cv = corpus.select(col(cId).as("n_id"), col(cEmb).as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("n_id"))
    cand.join(broadcast(qv), Seq("q_id")).join(cv, Seq("n_id"))
      .withColumn("d2",
        aggregate(zip_with(col("q_emb"), col("n_emb"), (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }), lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("d2"))
  }
}
