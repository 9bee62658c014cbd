package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CosineSimilarityExpr.cosineSim

/** Similarity-search operators over the `embeddings` table
  * (`Array[Float]`, dim 64). The brute-force variants here are the
  * oracle-checkable baselines; the LSH-bucketed scale path lives in
  * `graft.operators.Similarity` (not SQL-expressible → rows-only check).
  *
  * Scale design: brute-force top-k is a broadcast of the (small) query
  * set against a partitioned corpus — no shuffle of the corpus; the
  * per-query top-k is a TakeOrdered inside each partition followed by a
  * k-sized merge, which Catalyst derives from window rank + filter
  * under AQE.
  */
object EmbeddingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-label stats on exact (order-insensitive) reductions
    "embed_label_stats" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(element_at(col("embedding"), 1)).as("min_x0"),
          max(element_at(col("embedding"), 1)).as("max_x0"))
        .orderBy(col("label"))
    }),

    // brute-force cosine top-5 neighbors for query vectors vec_id < 5
    // (ids + rank only: scores are engine-precision-identical by
    // construction but kept out of the hash for robustness)
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queriesDf = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val corpus = emb
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      broadcast(queriesDf).crossJoin(corpus)
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", cosineSim(col("q_emb"), col("n_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // same contract as ann_cosine_topk but via the k-bounded TopK
    // aggregate (map-side partial) instead of a window rank — checked
    // against the identical oracle
    "ann_topk_agg" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity
        .bruteForceTopKAgg(emb.filter(col("vec_id") < 5), emb, k = 5)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // SemDeDup: nearest-centroid clustering (k=8, deterministic firstK
    // centroids) then within-cluster cosine pairs only — the semantic
    // dedup pass a curation pipeline runs after exact/minhash dedup.
    "semdedup_embed" -> ((s, dir) => {
      graft.operators.SemDedup.report(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 8, threshold = 0.4)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup against REAL k-means centroids (Ivf.train, nlist=8,
    // one Lloyd round — same quantizer ann_ivf_topk uses): the
    // production flavor, where the space partitioning comes from the
    // data rather than the first k ids. Oracled by replaying the
    // deterministic Lloyd training in SQL, as ann_ivf_topk proved out.
    "semdedup_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = graft.operators.Ivf.train(emb, nlist = 8, iters = 1)
      graft.operators.SemDedup.reportWith(emb,
          graft.operators.SemDedup.centroidFrame(s, cents),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy(col("vec_id"))
    }),

    // product-quantization ADC search (graft.operators.Pq): 64-dim
    // vectors → 8 subspaces × 16 codewords (init-only codebooks =
    // the 16 lowest-id vectors' slices — deterministic, so the oracle
    // replays encode+LUT+rank in SQL; trained-codebook quality is
    // PqSpec's job). Candidates cost 8 table lookups each instead of
    // 64 float ops; the encoded corpus is the only large table.
    "ann_pq_adc" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cbs = graft.operators.Pq.train(emb, dim = 64, m = 8, k = 16,
        iters = 0)
      val codes = graft.operators.Pq.encode(emb, dim = 64, cbs)
      graft.operators.Pq.adcTopK(emb.filter(col("vec_id") < 5), codes,
          dim = 64, cbs, k = 5)
        .select(col("q_id"), col("rank"), col("n_id"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // embedding-cosine near-dup: bounded candidate window, threshold
    "embed_neardup_pairs" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // window offsets exploded -> equi-join (hash), not an O(n²)
      // nested-loop range join
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        .withColumn("id_b", explode(array((1 to 5).map(d => col("id_a") + d): _*)))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      a.join(b, Seq("id_b"))
        .withColumn("cos", cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // connected components over the near-dup graph, FORCED onto the
    // distributed min-label-propagation path (driverEdgeLimit=0) so the
    // scale code path — not the driver union-find shortcut — is what
    // the oracle checks: each round joins labels to the symmetric edge
    // list and takes the neighborhood min, with a label-sum convergence
    // probe instead of per-round counts. The oracle replays the same
    // fixpoint as a recursive reachability CTE.
    "graph_components" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        .withColumn("id_b", explode(array((1 to 5).map(d => col("id_a") + d): _*)))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      val pairs = a.join(b, Seq("id_b"))
        .withColumn("cos", cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"))
      graft.operators.Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
        .select(col("id"), col("cluster_id"))
        .orderBy(col("id"))
    }),

    // fixed-iteration PageRank (graft.operators.PageRank) over the
    // customer↔supplier trade graph (bipartite edges from
    // lineitem⋈orders, symmetrized so every node has out-degree ≥ 1;
    // parity-tagged node ids keep the two keyspaces disjoint). Three
    // integer supersteps — every division is BIGINT `div`, so the
    // oracle replays the exact iterations as three unrolled CTE
    // layers. Per-iteration plan: one edges⋈ranks join + one partial-
    // aggregated groupBy(dst) — the Pregel superstep, AQE-skew-safe.
    "graph_pagerank" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val sym = e0.union(e0.select((col("dst")).as("src"), col("src").as("dst")))
      graft.operators.PageRank.ranks(sym, iterations = 3)
        .withColumn("kind",
          when(col("node") % 2 === 0, "customer").otherwise("supplier"))
        .withColumn("entity_id", expr("node div 2"))
        .select(col("kind"), col("entity_id"), col("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("kind"), col("entity_id"))
        .limit(20)
    }),

    // triangle counting over the same near-dup graph, by degree-ordered
    // orientation (Suri-Vassilvitskii WWW'11): every triangle is
    // generated once from its (degree,id)-smallest corner and oriented
    // out-degrees are O(√m), so no hub node owns a quadratic wedge set
    // ("last reducer" curse). The oracle enumerates each triangle once
    // as a < b < c over the canonical edge list.
    "graph_triangles" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        .withColumn("id_b", explode(array((1 to 8).map(d => col("id_a") + d): _*)))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      val pairs = a.join(b, Seq("id_b"))
        .withColumn("cos", cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.1)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      graft.operators.Triangles.perNode(pairs)
        .select(col("node"), col("n_triangles"))
        .orderBy(col("node"))
    }),

    // bounded-depth BFS (operators.Bfs) from the first three customers
    // over the symmetrized trade graph: exact hop distances, one
    // frontier join + settled anti-join per hop. The oracle unrolls
    // the three supersteps as frontier/settled CTE layers.
    "graph_bfs_hops" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val sources = Tables.customer(s, dir)
        .filter(col("c_custkey") <= 3)
        .select((col("c_custkey") * 2).as("node"))
      graft.operators.Bfs.hops(sym, sources, maxHops = 3)
        .select(col("node"), col("dist"))
        .orderBy(col("node"))
    }),

    // bounded Bellman-Ford over the weighted trade graph: edge weight
    // = distinct orders linking customer↔supplier, distance = minimum
    // total weight over <=3-edge paths. Oracle unrolls the three
    // min-plus relaxation layers; integer weights keep it exact.
    "graph_sssp" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .agg(countDistinct(col("l_orderkey")).as("w"))
      val sym = e0.unionByName(e0.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
      val sources = Tables.customer(s, dir)
        .filter(col("c_custkey") <= 3)
        .select((col("c_custkey") * 2).as("node"))
      graft.operators.Bfs.ssspRounds(sym, sources, rounds = 3)
        .select(col("node"), col("dist"))
        .orderBy(col("node"))
    }),

    // Johnson-Lindenstrauss random projection 64 → 8: seeded Gaussian
    // planes (same generator as the LSH tables), each output component
    // a sequential dot-product fold — narrow, zero-shuffle feature
    // transform (the dim-reduction pass before cheap ANN). The oracle
    // embeds the exact plane literals and replays the fold with
    // list_reduce, so the doubles are bit-identical cross-engine.
    "embed_random_projection" -> ((s, dir) => {
      val ps = graft.operators.Similarity.planes(8, 64, 7L)
      val cols = ps.zipWithIndex.map { case (p, i) =>
        graft.functions.VectorFunctions.dot(col("embedding"),
          typedlit(p.toSeq)).as(s"p$i")
      }
      Tables.embeddings(s, dir)
        .select((col("vec_id") +: cols): _*)
        .orderBy(col("vec_id"))
    }),

    // hybrid retrieval: reciprocal-rank fusion of a lexical BM25 leg
    // and a dense cosine leg (the modern two-tower search stack in one
    // query). BOTH legs ride the sharded GlobalRank operator — the
    // dense leg ranks the whole corpus (cos-band shards) and the
    // lexical leg ranks every doc matching a query term, which for a
    // common term is corpus-proportional at 100 TB (bm25-band shards;
    // no partitionless window anywhere). Fusion is pure integer math —
    // 10^9 div (60 + rank), the standard RRF k — summed over a
    // full-outer join of the legs, so the blended score is exact in
    // both engines; cosine doubles cross the engine boundary on the
    // established list_cosine_similarity corridor.
    "hybrid_search_rrf" -> ((s, dir) => {
      val qTerms = Seq("spark", "query", "hash")
      // lexical leg — BM25, same determinism discipline as
      // text_bm25_topk (integerized contribs, associative sum)
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = tok.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = tok
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val lexScores = tf.join(broadcast(dfreq), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf_scaled", expr("(1000 * n_docs) div df"))
        .withColumn("tf_norm",
          col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .withColumn("contrib",
          floor(col("tf_norm") * lit(1000000.0)) * col("idf_scaled"))
        .groupBy(col("doc_id"))
        .agg(sum(col("contrib")).as("bm25"))
      // r4 verdict item: a common query term matches a corpus-
      // proportional doc set at 100 TB, so the lexical leg must NOT
      // rank with a partitionless window — shard by a bm25 magnitude
      // band (monotone in the sort order) exactly as the dense leg
      // shards by cosine band, and let GlobalRank chain the offsets
      val lexRanked = graft.operators.GlobalRank.withGlobalRank(lexScores,
          Seq(col("bm25").desc, col("doc_id")),
          expr("(-bm25) div 1000000000"), "r_lex")
        .select(col("doc_id"), col("r_lex"))
      // dense leg — cosine to the vec_id=0 probe over every OTHER
      // vector, globally ranked without a global sort
      val emb = Tables.embeddings(s, dir)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val scored = emb.crossJoin(broadcast(probe))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", cosineSim(col("q_emb"), col("embedding")))
      val vec = graft.operators.GlobalRank.withGlobalRank(scored,
          Seq(col("cos").desc, col("vec_id")),
          floor(-col("cos") * lit(4)).cast("int"), "r_vec")
        .select(col("vec_id").as("doc_id"), col("r_vec"))
      lexRanked.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf_ppb",
          coalesce(expr("1000000000 div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000000 div (60 + r_vec)"), lit(0L)))
        .orderBy(col("rrf_ppb").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf_ppb"))
    }),
  )

  // The hyperplane-LSH oracle embeds the EXACT plane values as SQL
  // literals (they are seeded constants, generated here from the same
  // Similarity.planes call the operator uses — Double.toString
  // round-trips, so the parsed literals are bit-identical), and mirrors
  // the signature's sequential dot-product fold with list_reduce.
  private def planeDotSql(p: Array[Double]): String = {
    // plane literals ride as VARCHAR and cast per element: DuckDB's
    // numeric-ARRAY literal parse rounds ~25% of these doubles one ulp
    // off the scalar/string parse (sign-only LSH uses never noticed;
    // the projection oracle's raw doubles did), while string→DOUBLE
    // is correctly rounded and bit-matches Scala's Double.toString
    // round-trip
    val lit = p.map(d => s"'${d.toString}'").mkString("[", ", ", "]")
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"j -> embedding[j]::DOUBLE * " +
      s"(list_transform($lit, s -> s::DOUBLE))[j])), (a, b) -> a + b)"
  }

  private val lshBucketSql: String =
    graft.operators.Similarity.planes(10, 64, 42L).zipWithIndex.map {
      case (p, i) => s"CASE WHEN ${planeDotSql(p)} > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")

  /** Signature SQL for one hyperplane table (mirrors
    * `Similarity.signature` at the given seed).
    */
  private def sigSql(numPlanes: Int, seed: Long): String =
    graft.operators.Similarity.planes(numPlanes, 64, seed).zipWithIndex.map {
      case (p, i) => s"CASE WHEN ${planeDotSql(p)} > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")

  /** ann_lsh_topk ground truth: the operator probes each query's
    * bucket and every 1-bit flip in each of 4 tables, so a corpus
    * vector is a candidate iff hamming(sig_q, sig_n) <= 1 in ANY
    * table — expressed directly with bit_count(xor(...)), no probe
    * enumeration. Seeds 42 + 131t match `Similarity.lshTopK`.
    */
  private val annLshOracle: String = {
    val sigs = (0 until 4).map(t => sigSql(12, 42L + 131L * t))
    val sigCols = sigs.zipWithIndex
      .map { case (s, t) => s"($s) AS s$t" }.mkString(",\n    ")
    val hamming = (0 until 4)
      .map(t => s"bit_count(xor(q.qs$t, e.s$t)) <= 1").mkString(" OR ")
    s"""WITH e AS (
      |  SELECT vec_id, embedding,
      |    $sigCols
      |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
      |q AS (
      |  SELECT vec_id AS q_id, embedding AS q_emb,
      |    s0 AS qs0, s1 AS qs1, s2 AS qs2, s3 AS qs3
      |  FROM e WHERE vec_id < 5),
      |cand AS (
      |  SELECT q.q_id, e.vec_id AS n_id, q.q_emb, e.embedding AS n_emb
      |  FROM q JOIN e ON e.vec_id <> q.q_id AND ($hamming)),
      |ranked AS (
      |  SELECT q_id, n_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY
      |      list_cosine_similarity(q_emb::DOUBLE[], n_emb::DOUBLE[])
      |        DESC, n_id) AS rank
      |  FROM cand)
      |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin
  }

  // DuckDB list_cosine_similarity computes the same sequential fold in
  // double precision; outputs are id-only so a last-ulp divergence can
  // only matter on exact rank ties, which the vec_id tiebreak resolves.
  /** Squared-L2 SQL between a vector and a DOUBLE[] centroid column,
    * mirroring `Ivf.distances`' sequential fold.
    */
  private def l2Sql(centCol: String): String =
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"j -> (e.embedding[j]::DOUBLE - $centCol[j]) " +
      s"* (e.embedding[j]::DOUBLE - $centCol[j]))), (a, b) -> a + b)"

  /** ann_ivf_topk ground truth: the coarse quantizer is DETERMINISTIC
    * (init = 8 lowest-id vectors, one Lloyd round of per-dimension
    * means, first-minimum assignment), so the oracle replays training
    * in SQL — init, assign, per-(list,dim) means rebuilt into centroid
    * arrays, re-assign, probe the 4 nearest lists per query, exact
    * cosine rank within probed lists. Float ulp divergence between the
    * engines' mean/summation orders could only flip exact rank ties,
    * which the list_id / n_id tiebreaks resolve.
    */
  /** Shared Lloyd-replay CTEs (init from the 8 lowest-id vectors, one
    * round of per-dimension means, empty lists keep their init
    * centroid) — the deterministic `Ivf.train(nlist=8, iters=1)`
    * quantizer that both ann_ivf_topk and semdedup_kmeans consume.
    */
  private val lloydCents: String =
    """e AS (SELECT vec_id, embedding
      |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
      |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
      |         embedding
      |       FROM e ORDER BY vec_id LIMIT 8),
      |d1 AS (
      |  SELECT e.vec_id, c0.list_id,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |      j -> (e.embedding[j]::DOUBLE - c0.embedding[j]::DOUBLE)
      |         * (e.embedding[j]::DOUBLE - c0.embedding[j]::DOUBLE))),
      |      (a, b) -> a + b) AS d
      |  FROM e CROSS JOIN c0),
      |a1 AS (
      |  SELECT vec_id, list_id FROM (
      |    SELECT vec_id, list_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id)
      |        AS r
      |    FROM d1) WHERE r = 1),
      |m AS (
      |  SELECT a1.list_id, j, avg(e.embedding[j]::DOUBLE) AS v
      |  FROM a1 JOIN e USING (vec_id) CROSS JOIN range(1, 65) t(j)
      |  GROUP BY a1.list_id, j),
      |c1 AS (SELECT list_id, list(v ORDER BY j) AS cent
      |       FROM m GROUP BY list_id),
      |cents AS (
      |  SELECT c0.list_id,
      |    coalesce(c1.cent,
      |      list_transform(range(1, 65), j -> c0.embedding[j]::DOUBLE))
      |      AS cent
      |  FROM c0 LEFT JOIN c1 USING (list_id))""".stripMargin

  private val annIvfOracle: String =
    """WITH __LLOYD__,
      |idx AS (
      |  SELECT vec_id AS n_id, list_id FROM (
      |    SELECT e.vec_id, cents.list_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        __L2__, cents.list_id) AS r
      |    FROM e CROSS JOIN cents) WHERE r = 1),
      |probes AS (
      |  SELECT q_id, list_id FROM (
      |    SELECT e.vec_id AS q_id, cents.list_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        __L2__, cents.list_id) AS r
      |    FROM e CROSS JOIN cents WHERE e.vec_id < 5) WHERE r <= 4),
      |cand AS (
      |  SELECT p.q_id, i.n_id
      |  FROM probes p JOIN idx i USING (list_id)
      |  WHERE i.n_id <> p.q_id),
      |ranked AS (
      |  SELECT c.q_id, c.n_id,
      |    row_number() OVER (PARTITION BY c.q_id ORDER BY
      |      list_cosine_similarity(qe.embedding::DOUBLE[],
      |        ne.embedding::DOUBLE[]) DESC, c.n_id) AS rank
      |  FROM cand c
      |  JOIN e qe ON qe.vec_id = c.q_id
      |  JOIN e ne ON ne.vec_id = c.n_id)
      |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin
      .replace("__LLOYD__", lloydCents)
      .replace("__L2__", l2Sql("cents.cent"))

  /** semdedup_kmeans ground truth: same Lloyd replay, centroids rounded
    * to FLOAT (mirroring `SemDedup.centroidFrame` — both engines round
    * to the nearest float32, then widen exactly back to double inside
    * the cosine), then the semdedup_embed assignment/pair/size plan
    * against those centroids.
    */
  private val semdedupKmeansOracle: String =
    """WITH __LLOYD__,
      |cf AS (
      |  SELECT list_id AS cent_id,
      |    list_transform(cent, v -> v::FLOAT::DOUBLE) AS cent_emb
      |  FROM cents),
      |s AS (
      |  SELECT e.vec_id, cf.cent_id,
      |    list_cosine_similarity(e.embedding::DOUBLE[], cf.cent_emb) AS cos
      |  FROM e CROSS JOIN cf),
      |r AS (
      |  SELECT vec_id, cent_id,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cos DESC, cent_id) AS rn
      |  FROM s),
      |asg AS (
      |  SELECT r.vec_id, r.cent_id AS cluster_id, e.embedding
      |  FROM r JOIN e ON r.vec_id = e.vec_id WHERE rn = 1),
      |dups AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM asg a JOIN asg b
      |    ON a.cluster_id = b.cluster_id AND b.vec_id > a.vec_id
      |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
      |      b.embedding::DOUBLE[]) >= 0.4),
      |sized AS (
      |  SELECT vec_id, cluster_id,
      |    count(*) OVER (PARTITION BY cluster_id) AS n_cluster
      |  FROM asg)
      |SELECT s.vec_id, s.cluster_id,
      |  CAST(s.n_cluster AS BIGINT) AS n_cluster,
      |  d.vec_id IS NOT NULL AS is_dup,
      |  d.vec_id IS NULL AS kept
      |FROM sized s LEFT JOIN dups d ON s.vec_id = d.vec_id
      |ORDER BY s.vec_id""".stripMargin
      .replace("__LLOYD__", lloydCents)

  /** ann_ivfpq_topk ground truth: the coarse-quantizer replay of
    * annIvfOracle (idx/probes over the Lloyd centroids) composed with
    * the encode/LUT replay of ann_pq_adc, ADC restricted to candidates
    * in the probed lists — then the production tail: the ADC top-50
    * shortlist re-ranks by EXACT squared L2 over the raw vectors.
    * Subspace/dimension sums fold in fixed order on both engines, so
    * the doubles are bit-identical and only exact ties — broken by
    * n_id — could differ.
    */
  private val annIvfPqOracle: String =
    """WITH __LLOYD__,
      |idx AS (
      |  SELECT vec_id AS n_id, list_id FROM (
      |    SELECT e.vec_id, cents.list_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        __L2__, cents.list_id) AS r
      |    FROM e CROSS JOIN cents) WHERE r = 1),
      |probes AS (
      |  SELECT q_id, list_id FROM (
      |    SELECT e.vec_id AS q_id, cents.list_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        __L2__, cents.list_id) AS r
      |    FROM e CROSS JOIN cents WHERE e.vec_id < 5) WHERE r <= 4),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id,
      |    embedding
      |  FROM e ORDER BY vec_id LIMIT 16),
      |sd AS (
      |  SELECT e.vec_id, js.j, cb.code_id,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
      |      t -> (e.embedding[js.j * 8 + t]::DOUBLE
      |          - cb.embedding[js.j * 8 + t]::DOUBLE)
      |         * (e.embedding[js.j * 8 + t]::DOUBLE
      |          - cb.embedding[js.j * 8 + t]::DOUBLE))),
      |      (a, b) -> a + b) AS d2
      |  FROM e CROSS JOIN range(0, 8) js(j) CROSS JOIN cb),
      |asg AS (
      |  SELECT vec_id, j, code_id FROM (
      |    SELECT vec_id, j, code_id,
      |      row_number() OVER (PARTITION BY vec_id, j
      |        ORDER BY d2, code_id) AS r
      |    FROM sd) WHERE r = 1),
      |cand AS (
      |  SELECT p.q_id, i.n_id
      |  FROM probes p JOIN idx i USING (list_id)
      |  WHERE i.n_id <> p.q_id),
      |adc AS (
      |  SELECT c.q_id, c.n_id,
      |    list_reduce(list_prepend(0.0, list(dq.d2 ORDER BY dq.j)),
      |      (x, y) -> x + y) AS adc_d2
      |  FROM cand c
      |  JOIN asg a ON a.vec_id = c.n_id
      |  JOIN sd dq ON dq.vec_id = c.q_id AND dq.j = a.j
      |    AND dq.code_id = a.code_id
      |  GROUP BY c.q_id, c.n_id),
      |short AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id)
      |        AS pr
      |    FROM adc) WHERE pr <= 50),
      |rr AS (
      |  SELECT s.q_id, s.n_id,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |      j -> (qe.embedding[j]::DOUBLE - ne.embedding[j]::DOUBLE)
      |         * (qe.embedding[j]::DOUBLE - ne.embedding[j]::DOUBLE))),
      |      (a, b) -> a + b) AS d2
      |  FROM short s
      |  JOIN e qe ON qe.vec_id = s.q_id
      |  JOIN e ne ON ne.vec_id = s.n_id),
      |ranked AS (
      |  SELECT q_id, n_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id)
      |      AS rank
      |  FROM rr)
      |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin
      .replace("__LLOYD__", lloydCents)
      .replace("__L2__", l2Sql("cents.cent"))

  val oracle: Map[String, String] = Map(
    "ann_lsh_topk" -> annLshOracle,
    "ann_ivf_topk" -> annIvfOracle,
    "ann_ivfpq_topk" -> annIvfPqOracle,
    "semdedup_kmeans" -> semdedupKmeansOracle,

    "embed_neardup_lsh" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding, ($lshBucketSql) AS bucket
        |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet'))
        |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a JOIN e b ON a.bucket = b.bucket AND b.vec_id > a.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]) >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,
    "embed_label_stats" ->
      """SELECT label, count(*) AS n,
        |  min(embedding[1]) AS min_x0, max(embedding[1]) AS max_x0
        |FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') GROUP BY label ORDER BY label""".stripMargin,

    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
        |  FROM q CROSS JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') e WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, n_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    "ann_topk_agg" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
        |  FROM q CROSS JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') e WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, n_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // assignment + pair verdicts mirror the Spark plan exactly; cosine
    // values are bit-identical (sequential fold both sides) so the
    // DESC/cent_id ranking and the >= threshold cut agree
    "semdedup_embed" ->
      """WITH e AS (
        |  SELECT vec_id, embedding
        |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |c AS (
        |  SELECT vec_id AS cent_id, embedding AS cent_emb
        |  FROM e WHERE vec_id < 8),
        |s AS (
        |  SELECT e.vec_id, c.cent_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      c.cent_emb::DOUBLE[]) AS cos
        |  FROM e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, cent_id) AS rn
        |  FROM s),
        |asg AS (
        |  SELECT r.vec_id, r.cent_id AS cluster_id, e.embedding
        |  FROM r JOIN e ON r.vec_id = e.vec_id WHERE rn = 1),
        |dups AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM asg a JOIN asg b
        |    ON a.cluster_id = b.cluster_id AND b.vec_id > a.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |      b.embedding::DOUBLE[]) >= 0.4),
        |sized AS (
        |  SELECT vec_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS n_cluster
        |  FROM asg)
        |SELECT s.vec_id, s.cluster_id,
        |  CAST(s.n_cluster AS BIGINT) AS n_cluster,
        |  d.vec_id IS NOT NULL AS is_dup,
        |  d.vec_id IS NULL AS kept
        |FROM sized s LEFT JOIN dups d ON s.vec_id = d.vec_id
        |ORDER BY s.vec_id""".stripMargin,

    "embed_neardup_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') a JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') b
        |  ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 5
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "graph_components" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') a
        |  JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') b
        |    ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 5
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]) >= 0.3),
        |e AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r(id, seen) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.seen FROM e JOIN r ON r.id = e.src)
        |SELECT id, min(seen) AS cluster_id FROM r GROUP BY id
        |ORDER BY id""".stripMargin,

    // each triangle exactly once as x < y < z over canonical (a < b)
    // edges: (x,y), (y,z), (x,z) are all canonical
    "graph_triangles" ->
      """WITH p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') a
        |  JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') b
        |    ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 8
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]) >= 0.1),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM p e1 JOIN p e2 ON e2.a = e1.b
        |  JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, count(*) AS n_triangles
        |FROM nodes GROUP BY node ORDER BY node""".stripMargin,

    // three unrolled BFS supersteps: frontier = neighbors of the
    // previous layer minus everything already settled
    "graph_bfs_hops" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |d0 AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer
        |  WHERE c_custkey <= 3),
        |d1 AS (
        |  SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0)),
        |d2 AS (
        |  SELECT DISTINCT e.dst AS node FROM e JOIN d1 ON e.src = d1.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0)
        |    AND e.dst NOT IN (SELECT node FROM d1)),
        |d3 AS (
        |  SELECT DISTINCT e.dst AS node FROM e JOIN d2 ON e.src = d2.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0)
        |    AND e.dst NOT IN (SELECT node FROM d1)
        |    AND e.dst NOT IN (SELECT node FROM d2))
        |SELECT node, 0 AS dist FROM d0
        |UNION ALL SELECT node, 1 FROM d1
        |UNION ALL SELECT node, 2 FROM d2
        |UNION ALL SELECT node, 3 FROM d3
        |ORDER BY node""".stripMargin,

    // three unrolled min-plus relaxation layers (Bellman-Ford rounds)
    "graph_sssp" ->
      """WITH e0 AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
        |    count(DISTINCT l_orderkey) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM e0
        |  UNION ALL SELECT dst, src, w FROM e0),
        |d0 AS (SELECT DISTINCT c_custkey * 2 AS node,
        |    CAST(0 AS BIGINT) AS dist
        |  FROM customer WHERE c_custkey <= 3),
        |r1 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM d0
        |    UNION ALL SELECT e.dst, d0.dist + e.w FROM e
        |    JOIN d0 ON e.src = d0.node) GROUP BY node),
        |r2 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM r1
        |    UNION ALL SELECT e.dst, r1.dist + e.w FROM e
        |    JOIN r1 ON e.src = r1.node) GROUP BY node),
        |r3 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM r2
        |    UNION ALL SELECT e.dst, r2.dist + e.w FROM e
        |    JOIN r2 ON e.src = r2.node) GROUP BY node)
        |SELECT node, dist FROM r3 ORDER BY node""".stripMargin,

    // plane literals + list_reduce fold ≡ VectorFunctions.dot
    "embed_random_projection" -> {
      val cols = graft.operators.Similarity.planes(8, 64, 7L)
        .zipWithIndex.map { case (p, i) => s"${planeDotSql(p)} AS p$i" }
        .mkString(",\n  ")
      s"""SELECT vec_id, $cols
         |FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')
         |ORDER BY vec_id""".stripMargin
    },

    // replays Pq (init-only codebooks): encode = per-(vector,subspace)
    // argmin over the 16 lowest-id vectors' slices, ADC = the query's
    // LUT entries summed in subspace order (list_reduce mirrors the
    // sequential fold, so float sums are bit-identical)
    "ann_pq_adc" ->
      """WITH e AS (SELECT vec_id, embedding
        |  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id,
        |    embedding
        |  FROM e ORDER BY vec_id LIMIT 16),
        |d AS (
        |  SELECT e.vec_id, js.j, cb.code_id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |      t -> (e.embedding[js.j * 8 + t]::DOUBLE
        |          - cb.embedding[js.j * 8 + t]::DOUBLE)
        |         * (e.embedding[js.j * 8 + t]::DOUBLE
        |          - cb.embedding[js.j * 8 + t]::DOUBLE))),
        |      (a, b) -> a + b) AS d2
        |  FROM e CROSS JOIN range(0, 8) js(j) CROSS JOIN cb),
        |asg AS (
        |  SELECT vec_id, j, code_id FROM (
        |    SELECT vec_id, j, code_id,
        |      row_number() OVER (PARTITION BY vec_id, j
        |        ORDER BY d2, code_id) AS r
        |    FROM d) WHERE r = 1),
        |adc AS (
        |  SELECT dq.vec_id AS q_id, a.vec_id AS n_id,
        |    list_reduce(list_prepend(0.0, list(dq.d2 ORDER BY dq.j)),
        |      (x, y) -> x + y) AS adc_d2
        |  FROM asg a JOIN d dq ON dq.j = a.j AND dq.code_id = a.code_id
        |  WHERE dq.vec_id < 5 AND a.vec_id <> dq.vec_id
        |  GROUP BY dq.vec_id, a.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id)
        |      AS rank
        |  FROM adc)
        |SELECT q_id, rank, n_id FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // replays PageRank.ranks verbatim: same integer divisions, three
    // unrolled superstep layers (r0 → i/r1 → i/r2 → i/r3)
    "graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
        |n AS (SELECT count(*) AS n_nodes FROM d),
        |r0 AS (SELECT node, deg, 1000000000000 // n_nodes AS r
        |  FROM d CROSS JOIN n),
        |i1 AS (SELECT e.dst AS node, CAST(SUM(r0.r // r0.deg) AS BIGINT)
        |    AS in_sum
        |  FROM e JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r1 AS (SELECT d.node, d.deg,
        |    (150000000000 // n_nodes) + (85 * coalesce(in_sum, 0)) // 100 AS r
        |  FROM d CROSS JOIN n LEFT JOIN i1 ON d.node = i1.node),
        |i2 AS (SELECT e.dst AS node, CAST(SUM(r1.r // r1.deg) AS BIGINT)
        |    AS in_sum
        |  FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r2 AS (SELECT d.node, d.deg,
        |    (150000000000 // n_nodes) + (85 * coalesce(in_sum, 0)) // 100 AS r
        |  FROM d CROSS JOIN n LEFT JOIN i2 ON d.node = i2.node),
        |i3 AS (SELECT e.dst AS node, CAST(SUM(r2.r // r2.deg) AS BIGINT)
        |    AS in_sum
        |  FROM e JOIN r2 ON e.src = r2.node GROUP BY e.dst),
        |r3 AS (SELECT d.node, d.deg,
        |    (150000000000 // n_nodes) + (85 * coalesce(in_sum, 0)) // 100 AS r
        |  FROM d CROSS JOIN n LEFT JOIN i3 ON d.node = i3.node),
        |out AS (
        |  SELECT CASE WHEN node % 2 = 0 THEN 'customer'
        |    ELSE 'supplier' END AS kind,
        |    node // 2 AS entity_id, CAST(r AS BIGINT) AS rank_scaled,
        |    node
        |  FROM r3)
        |SELECT kind, entity_id, rank_scaled FROM out
        |ORDER BY rank_scaled DESC, kind, entity_id LIMIT 20""".stripMargin,

    // BM25 arithmetic identical to the text_bm25_topk oracle; dense
    // leg on the list_cosine_similarity corridor; integer RRF fusion
    "hybrid_search_rrf" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |s AS (
        |  SELECT count(*) AS n_docs,
        |    CAST(SUM(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM d),
        |t AS (
        |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
        |tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM t
        |  WHERE term IN ('spark','query','hash') GROUP BY 1, 2, 3),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |lexs AS (
        |  SELECT doc_id,
        |    SUM(CAST(floor((tf * 2.2::DOUBLE
        |        / (tf + 1.2::DOUBLE * (0.25::DOUBLE
        |          + 0.75::DOUBLE * dl / avgdl)))
        |      * 1000000.0::DOUBLE) AS BIGINT)
        |      * ((1000 * n_docs) // df)) AS bm25
        |  FROM tf JOIN dfc USING (term) CROSS JOIN s GROUP BY doc_id),
        |lex AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
        |  FROM lexs),
        |emb AS (SELECT * FROM
        |  read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |probe AS (SELECT embedding AS q_emb FROM emb WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(p.q_emb::DOUBLE[],
        |      e.embedding::DOUBLE[]) AS cos
        |  FROM emb e CROSS JOIN probe p WHERE e.vec_id <> 0),
        |vec AS (
        |  SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY cos DESC, vec_id) AS r_vec
        |  FROM scored),
        |fused AS (
        |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    l.r_lex, v.r_vec,
        |    coalesce(1000000000 // (60 + l.r_lex), 0)
        |      + coalesce(1000000000 // (60 + v.r_vec), 0) AS rrf_ppb
        |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
        |SELECT doc_id, r_lex, r_vec, rrf_ppb FROM fused
        |ORDER BY rrf_ppb DESC, doc_id LIMIT 20""".stripMargin,
  )
}
