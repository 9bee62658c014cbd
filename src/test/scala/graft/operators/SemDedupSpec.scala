package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // two orthogonal axes as centroids (ids 0, 1); members near each
  // axis; 12 is a near-copy of 10 (same cluster, cos ~1), 22 a
  // near-copy of 20 in the other cluster; 30 sits alone near axis 0.
  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private val vectors = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0, 1, 0, 0)),
    (10L, vec(0.9, 0.1, 0, 0)),
    (12L, vec(0.9, 0.1, 0.01, 0)), // dup of 10
    (20L, vec(0.1, 0.9, 0, 0)),
    (22L, vec(0.1, 0.9, 0, 0.01)), // dup of 20
    (30L, vec(0.7, 0.2, 0.5, 0)),
  ).toDF("vec_id", "embedding")

  test("clusters split on nearest centroid; dups detected only within cluster") {
    val r = SemDedup.report(vectors, "vec_id", "embedding",
        k = 2, threshold = 0.999)
      .select("vec_id", "cluster_id", "is_dup")
      .as[(Long, Long, Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap

    assert(r(10L)._1 == 0L && r(12L)._1 == 0L && r(30L)._1 == 0L)
    assert(r(20L)._1 == 1L && r(22L)._1 == 1L)
    // higher id of each near-identical pair is the dup; all else kept
    assert(r(12L)._2 && r(22L)._2)
    assert(Seq(0L, 1L, 10L, 20L, 30L).forall(!r(_)._2))
  }

  test("cluster sizes count every member") {
    val r = SemDedup.report(vectors, "vec_id", "embedding",
        k = 2, threshold = 0.999)
      .select("cluster_id", "n_cluster").distinct()
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 4L, 1L -> 3L))
  }

  test("threshold 1.0+ marks nothing as dup") {
    val kept = SemDedup.report(vectors, "vec_id", "embedding",
        k = 2, threshold = 1.0001)
      .filter(col("kept")).count()
    assert(kept == 7L)
  }
}
