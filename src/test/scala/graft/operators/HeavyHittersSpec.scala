package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries heavy hitters: the superset guarantee under heavy
  * eviction pressure (capacity ≪ vocabulary), exactness of the
  * two-pass pipeline vs a naive GROUP BY/HAVING, and invariance
  * across partitionings (the mergeable-summaries property under
  * Spark's partial/final aggregation).
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // zipf-flavored stream: key i (1..40) appears ~1200/i times, plus a
  // long tail of 3000 singletons. n ≈ 1200·H(40)+3000 ≈ 8150; with
  // capacity 63 every key above n/64 ≈ 127 (i ≤ 9) must survive.
  private def stream = {
    val heads = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"k$i"))
    val tail = (1 to 3000).map(i => s"tail$i")
    (heads ++ tail).toDF("term")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, denom: Long) = {
    val n = df.count()
    df.groupBy("term").count()
      .filter(col("count") * denom > n)
      .select(col("term"), col("count").as("cnt"))
      .as[(String, Long)].collect().toMap
  }

  test("sketch candidates are a superset of true heavy hitters") {
    val truth = naive(stream, 64).keySet
    val cand = stream
      .agg(HeavyHitters.misraGriesUdaf(63)(col("term")).as("mg"))
      .select(explode(map_keys(col("mg"))).as("term"))
      .as[String].collect().toSet
    assert(truth.subsetOf(cand),
      s"lost hitters: ${truth.diff(cand).mkString(",")}")
    assert(cand.size <= 63)
  }

  test("two-pass exactHeavyHitters equals naive group-by/having") {
    val got = HeavyHitters.exactHeavyHitters(stream, "term", m = 63,
        denom = 64)
      .select("term", "cnt").as[(String, Long)].collect().toMap
    assert(got === naive(stream, 64))
  }

  test("result is partition-invariant (mergeable summaries)") {
    def run(parts: Int) =
      HeavyHitters.exactHeavyHitters(stream.repartition(parts), "term",
          m = 63, denom = 64)
        .select("term", "cnt").as[(String, Long)].collect().toMap
    assert(run(1) === run(29))
  }

  test("capacity below the threshold guarantee is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(stream, "term", m = 62, denom = 64)
    }
  }
}
