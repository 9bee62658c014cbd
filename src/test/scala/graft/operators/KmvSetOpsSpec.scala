package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy + structure of the theta-style KMV set operations. The
  * hash is fixed (md5-60bit), so every assertion here is
  * deterministic — the bounds are not flaky tolerances but the actual
  * error this estimator commits on this data, with margin.
  */
class KmvSetOpsSpec extends SparkSpec {

  import spark.implicits._

  test("union/intersection estimates land near exact counts") {
    // |A| = 6000, |B| = 6000, |A∩B| = 3000, |A∪B| = 9000
    val a = (0 until 6000).toDF("k")
    val b = (3000 until 9000).toDF("k")
    val r = DetSketch.kmvSetOps(a, b, "k", k = 256).head()

    assert(r.getAs[Long]("n_a") == 256 && r.getAs[Long]("n_b") == 256)
    assert(r.getAs[Long]("theta") ==
      math.min(r.getAs[Long]("theta_a"), r.getAs[Long]("theta_b")))
    val unionEst = r.getAs[Double]("union_est")
    val interEst = r.getAs[Double]("inter_est")
    // k=256 ⇒ ~1/√k ≈ 6% relative std for the union; intersection
    // inherits extra variance from the sample-of-sample. Generous 3σ.
    assert(math.abs(unionEst - 9000.0) / 9000.0 < 0.20,
      s"union_est=$unionEst")
    assert(math.abs(interEst - 3000.0) / 3000.0 < 0.35,
      s"inter_est=$interEst")
  }

  test("small sets: sketches are the exact sets, union est exact") {
    val a = (0 until 40).toDF("k")
    val b = (20 until 60).toDF("k")
    val r = DetSketch.kmvSetOps(a, b, "k", k = 128).head()
    assert(r.getAs[Long]("n_a") == 40 && r.getAs[Long]("n_b") == 40)
    assert(r.getAs[Long]("n_union_k") == 60)
    // under-full union sketch reports the exact distinct count
    assert(r.getAs[Double]("union_est") == 60.0)
    assert(r.getAs[Long]("n_inter") == 20)
  }

  test("disjoint sets: zero intersection sample, zero estimate") {
    val a = (0 until 3000).toDF("k")
    val b = (10000 until 13000).toDF("k")
    val r = DetSketch.kmvSetOps(a, b, "k", k = 128).head()
    assert(r.getAs[Long]("n_inter") == 0)
    assert(r.getAs[Double]("inter_est") == 0.0)
  }
}
