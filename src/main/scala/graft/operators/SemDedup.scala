package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityExpr.cosineSim

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et
  * al. 2023, arXiv:2303.09540): assign every vector to its nearest
  * centroid, then search for high-cosine duplicate pairs only WITHIN a
  * cluster — reducing the candidate space from O(n²) to O(Σ cᵢ²) — and
  * greedily keep the lowest-id member of each duplicate pair.
  *
  * Scale shape: the centroid table is k×dim (tiny) and broadcasts;
  * assignment is one narrow pass over the corpus (O(n·k) dot products
  * inside whole-stage codegen via the native [[cosineSim]] kernel); the
  * within-cluster self-join is an equi-join on `cluster_id`, so AQE can
  * split a skewed cluster the way it splits any hot join key. Nothing
  * about the plan changes when the corpus is 100 TB — only k must grow
  * (SemDeDup uses k ≈ √n) to keep clusters bounded.
  *
  * Centroid choice is pluggable: [[assign]] takes any (cent_id,
  * cent_emb) frame. [[firstK]] (k smallest ids) is the deterministic
  * variant the DuckDB oracle can reproduce; at scale you'd feed
  * `Ivf.kmeans` centroids instead — the dedup semantics don't care how
  * the space was partitioned, only that it is.
  */
object SemDedup {

  /** Deterministic centroids: the k smallest-id vectors. TakeOrdered,
    * not `id < k` — ids need not be dense or 0-based (hashed/snowflake
    * ids would otherwise yield fewer or zero centroids and the report
    * would silently drop every vector).
    */
  def firstK(vectors: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cent_id"), col(embCol).as("cent_emb"))

  /** Nearest-centroid assignment: argmax cosine, ties to the smallest
    * centroid id. Adds `cluster_id` to `vectors`.
    */
  def assign(vectors: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col("cent_id"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cos", cosineSim(col(embCol), col("cent_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("cos", "rn", "cent_emb")
      .withColumnRenamed("cent_id", "cluster_id")
  }

  /** Per-vector dedup report: cluster assignment, cluster size, and the
    * greedy lowest-id-survives verdict — `is_dup` marks a vector that
    * has a lower-id cluster-mate at cosine ≥ `threshold`.
    */
  def report(vectors: DataFrame, idCol: String, embCol: String,
      k: Int = 8, threshold: Double = 0.4): DataFrame =
    reportWith(vectors, firstK(vectors, idCol, embCol, k),
      idCol, embCol, threshold)

  /** [[report]] against caller-supplied centroids — feed `Ivf.train`
    * output (via [[centroidFrame]]) for real k-means space
    * partitioning; the dedup semantics are identical.
    */
  def reportWith(vectors: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String, threshold: Double = 0.4): DataFrame = {
    // four consumers below (both pair sides, sizes, the final join):
    // without the persist the n×k crossJoin + assignment window — the
    // most expensive stage — runs four times (blocks release via LRU)
    val asg = assign(vectors, centroids, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val a = asg.select(col("cluster_id"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"))
    val b = asg.select(col("cluster_id"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"))
    // dup verdicts: sized by the corpus's duplicate FRACTION — tens of
    // percent on web-scale corpora — so no broadcast hint (AQE still
    // broadcasts when it measures small); only the k-row sizes frame
    // is safely broadcast-bounded
    val dups = a.join(b, Seq("cluster_id"))
      .filter(col("id_b") > col("id_a"))
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("is_dup", lit(true))

    // cluster sizes via groupBy (map-side partial collapses each hot
    // cluster to one row per task) + broadcast of the k-row result —
    // a window over cluster_id would funnel every row of a cluster
    // through one reducer with only k distinct keys to spread over
    val sizes = asg.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cluster"))
    asg.join(broadcast(sizes), Seq("cluster_id"))
      .join(dups, Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      .withColumn("kept", !col("is_dup"))
      .select(col(idCol), col("cluster_id"), col("n_cluster"),
        col("is_dup"), col("kept"))
  }

  /** `Ivf.train` centroids as the (cent_id, cent_emb) frame [[assign]]
    * expects. Values are rounded to FLOAT so assignment compares the
    * same dtype as the corpus embeddings (and so an oracle can
    * reproduce the rounding with a FLOAT cast).
    */
  def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }
      .toDF("cent_id", "cent_emb")
  }
}
