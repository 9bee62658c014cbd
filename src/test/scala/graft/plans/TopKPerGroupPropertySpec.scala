package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property coverage for the custom physical operator: on arbitrary
  * (group, score) datasets with unique scores, its result must equal
  * the window-rank formulation — any InternalRow mishandling (copy
  * semantics, heap eviction, null keys) shows up here.
  */
class TopKPerGroupPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, minTests: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  // (group in 0..g, rowIdx) — score derives bijectively from rowIdx,
  // so ties are impossible and both formulations are deterministic
  private val dataGen: Gen[(Int, Int, List[Int])] = for {
    nGroups <- Gen.choose(1, 6)
    k <- Gen.choose(1, 5)
    n <- Gen.choose(0, 120)
    groups <- Gen.listOfN(n, Gen.choose(0, nGroups - 1))
  } yield (nGroups, k, groups)

  test("random datasets: custom operator ≡ window rank; null groups kept") {
    check(Prop.forAll(dataGen) { case (_, k, groups) =>
      val rows = groups.zipWithIndex.map { case (g, i) =>
        // null key every 7th row — ClusteredDistribution must still
        // co-locate them and the heap treat null as a normal group
        (if (i % 7 == 0) None else Some(g.toLong),
          i.toLong, (i * 131).toDouble % 100000 + i * 1e-4)
      }
      val df = rows.toDF("g", "row_id", "score")
      val custom = TopKPerGroup.topK(df, Seq("g"), "score", k)
        .select("g", "row_id").collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toSet
      val w = Window.partitionBy($"g").orderBy($"score".desc)
      val expected = df.withColumn("rk", row_number().over(w))
        .filter($"rk" <= k).select("g", "row_id").collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toSet
      custom == expected
    })
  }
}
