package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityExpr.cosineSim

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nlist` inverted lists; queries
  * probe only the `nprobe` nearest lists. The classic FAISS-style
  * recall/throughput dial, built entirely from DataFrame ops:
  *
  *  - train: Lloyd iterations as grouped per-dimension averages
  *    (posexplode → groupBy(list, dim) → avg → collect the tiny
  *    nlist×dim table to the driver for the next literal plan);
  *  - index: argmin-of-distances assignment, one narrow pass over the
  *    corpus (centroids are plan literals — broadcast-free);
  *  - search: probe lists pre-partitioned by `list_id`, exact cosine
  *    only within probed lists, k-bounded TopK aggregate.
  *
  * At 100 TB: the index write partitions the corpus BY list_id
  * (`indexed.write.partitionBy("list_id")`), so each probe reads only
  * its lists' files — partition pruning does the candidate selection
  * before a single byte of embedding data is scanned.
  */
object Ivf {

  /** Squared L2 distances to every centroid, as an array column. The
    * centroid table is ONE nested-array literal looped over by
    * `transform`, not `nlist` unrolled per-centroid expressions — the
    * unrolled form generates O(nlist·dim) code and its JIT/codegen
    * compile time dominated the whole query at small scale.
    */
  private[operators] def distances(emb: Column, cents: Seq[Array[Double]]): Column =
    transform(typedlit(cents.map(_.toSeq)), c =>
      aggregate(
        zip_with(emb, c, (x, y) => {
          val d = x.cast("double") - y
          d * d
        }),
        lit(0.0), (acc, v) => acc + v))

  /** Nearest-centroid id (0-based, deterministic: first minimum). */
  def assignment(emb: Column, cents: Seq[Array[Double]]): Column = {
    val ds = distances(emb, cents)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** Lloyd k-means with deterministic init (lowest-id vectors). Returns
    * nlist × dim centroids. Each iteration: one assignment pass + one
    * dense per-list (sum, count) aggregation; empty lists keep their
    * previous centroid.
    *
    * Execution (r5 verdict item 4): the per-iteration statistics ride
    * `aggregateByKey` over DENSE vectors — map-side combined, so the
    * shuffle carries at most `partitions × nlist` partial vectors and
    * the driver receives ≤ nlist (sum, count) rows, never the old
    * `posexplode` plan's dim× row amplification and nlist×dim-ROW
    * collect. The mean itself is unchanged (sum/count), so the
    * deterministic-quantizer contract the SQL oracles replay holds.
    *
    * `maxTrainRows` bounds the TRAINING set to the lowest-id n vectors
    * (deterministic, same rule as the init) — the standard
    * sample-trained quantizer: at 100 TB the coarse centroids converge
    * on a bounded sample while indexing/search still cover the full
    * corpus, keeping train cost flat as the corpus grows. Default None
    * trains exactly as before.
    */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxTrainRows: Option[Int] = None): Seq[Array[Double]] = {
    val trainSet = maxTrainRows match {
      case Some(n) => corpus.select(col(idCol), col(embCol))
        .orderBy(col(idCol)).limit(n)
      case None => corpus.select(col(idCol), col(embCol))
    }
    // each Lloyd iteration scans the training set; cache it for the loop
    val cached = trainSet.persist()
    try trainImpl(cached, nlist, iters, idCol, embCol)
    finally cached.unpersist()
  }

  private def trainImpl(corpus: DataFrame, nlist: Int, iters: Int,
      idCol: String, embCol: String): Seq[Array[Double]] = {
    var cents: Seq[Array[Double]] = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq

    for (_ <- 1 to iters) {
      val stats = corpus.select(
          assignment(col(embCol), cents).as("list_id"), col(embCol).as("e"))
        .rdd
        .map(r => (r.getInt(0), r.getSeq[Float](1)))
        .aggregateByKey((Array.empty[Double], 0L))(
          (acc, v) => {
            val a = if (acc._2 == 0L) new Array[Double](v.length) else acc._1
            var i = 0
            while (i < v.length) { a(i) += v(i); i += 1 }
            (a, acc._2 + 1L)
          },
          (x, y) =>
            if (x._2 == 0L) y
            else if (y._2 == 0L) x
            else {
              val a = x._1
              var i = 0
              while (i < a.length) { a(i) += y._1(i); i += 1 }
              (a, x._2 + y._2)
            })
        .collect() // ≤ nlist dense rows
      val next = cents.map(_.clone()).toArray
      stats.foreach { case (list, (sum, n)) =>
        if (n > 0L) next(list) = sum.map(_ / n)
      }
      cents = next.toSeq
    }
    cents
  }

  /** Corpus with its inverted-list assignment. Persist with
    * `.write.partitionBy("list_id")` for pruned probes at scale.
    */
  def index(corpus: DataFrame, cents: Seq[Array[Double]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"),
      assignment(col(embCol), cents).as("list_id"))

  /** `nprobe` nearest lists per query as (q_id, q_emb, list_id) rows:
    * posexplode centroid distances (pos IS the 0-based list id), rank.
    */
  private def probeAssignments(queries: DataFrame, cents: Seq[Array[Double]],
      nprobe: Int, qId: String, qEmb: String): DataFrame =
    queries.select(col(qId).as("q_id"), col(qEmb).as("q_emb"))
      .select(col("q_id"), col("q_emb"),
        posexplode(distances(col("q_emb"), cents)).as(Seq("list_id", "d")))
      .withColumn("probe_rank",
        row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("d"), col("list_id"))))
      .filter(col("probe_rank") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("list_id"))

  /** Exact cosine within the probed lists, k-bounded TopK aggregate
    * (map-side partial — only k rows per query per partition shuffle).
    */
  private def scoreProbes(probes: DataFrame, indexed: DataFrame,
      k: Int): DataFrame =
    broadcast(probes).join(indexed, Seq("list_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineSim(col("q_emb"), col("n_emb")))
      .groupBy(col("q_id"))
      .agg(TopK.topKUdaf(k)(col("cos"), col("n_id")).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "entry")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("entry._2").as("n_id"), col("entry._1").as("cos"))

  /** IVF top-k search over an in-memory corpus. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
      qId: String = "vec_id", qEmb: String = "embedding",
      cId: String = "vec_id", cEmb: String = "embedding"): DataFrame = {
    val cents = train(corpus, nlist, iters, cId, cEmb)
    val indexed = index(corpus, cents, cId, cEmb)
    scoreProbes(probeAssignments(queries, cents, nprobe, qId, qEmb),
      indexed, k)
  }

  /** Materialize the inverted-file index partitioned BY list: each
    * probed list is its own directory, so searches prune whole
    * partitions at the source. This is the 100 TB layout — candidate
    * selection happens before a byte of embedding data is scanned.
    */
  def writeIndex(corpus: DataFrame, cents: Seq[Array[Double]], dir: String,
      cId: String = "vec_id", cEmb: String = "embedding"): Unit =
    index(corpus, cents, cId, cEmb)
      .write.partitionBy("list_id").mode("overwrite").parquet(dir)

  /** Append a new vector batch to a disk index written by
    * [[writeIndex]]: assign against the SAME centroids (the quantizer
    * is frozen — retrain is a periodic offline job, as in any IVF
    * deployment) and append to the per-list partitions. Indexing new
    * data is O(new batch); existing lists are untouched on disk.
    */
  def appendToIndex(newVecs: DataFrame, cents: Seq[Array[Double]],
      dir: String, cId: String = "vec_id",
      cEmb: String = "embedding"): Unit =
    index(newVecs, cents, cId, cEmb)
      .write.partitionBy("list_id").mode("append").parquet(dir)

  /** IVF top-k over a disk index written by [[writeIndex]]: the union
    * of the queries' probed lists becomes an `isin` over the partition
    * column — partition pruning reads only those lists' files. The
    * probed-list set is nlist-bounded (driver-tiny, like the centroid
    * table itself).
    */
  def searchIndex(indexDir: String, queries: DataFrame,
      cents: Seq[Array[Double]], k: Int, nprobe: Int = 4,
      qId: String = "vec_id", qEmb: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val probes = probeAssignments(queries, cents, nprobe, qId, qEmb)
    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val indexed = spark.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists.toSeq.map(Int.box): _*))
      .select(col("n_id"), col("n_emb"),
        col("list_id").cast("int").as("list_id"))
    scoreProbes(probes, indexed, k)
  }
}
