package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid-pruned skyline must equal the definitional O(n²) dominance
  * filter — on random data, under any grid resolution, with duplicate
  * points, and with a mixed minimize/maximize criterion. The pruning
  * argument (a pruned row's dominator chain ends at a survivor) is
  * exactly what these identities exercise.
  */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def bruteSkyline(df: DataFrame, dims: Seq[String]): Set[Long] = {
    val rows = df.select((Seq(col("id")) ++ dims.map(col)): _*).collect()
      .map(r => (r.getLong(0), dims.indices.map(i =>
        r.getDouble(i + 1)).toVector))
    rows.filter { case (_, p) =>
      !rows.exists { case (_, q) =>
        q.indices.forall(i => q(i) <= p(i)) && q.indices.exists(i => q(i) < p(i))
      }
    }.map(_._1).toSet
  }

  private val rnd = {
    // deterministic pseudo-random points, incl. exact duplicates
    val pts = (1 to 400).map { i =>
      val x = (i * 7919 % 401).toDouble / 4.0
      val y = (i * 104729 % 397).toDouble / 4.0
      (i.toLong, x, y)
    }
    (pts ++ pts.take(20).map { case (id, x, y) => (id + 1000L, x, y) })
      .toSeq.toDF("id", "x", "y")
  }

  test("grid-pruned == definitional skyline at several grid sizes") {
    val expected = bruteSkyline(rnd.withColumn("xd", col("x"))
      .withColumn("yd", col("y")), Seq("xd", "yd"))
    for (g <- Seq(2, 8, 64)) {
      val got = Skyline.of(rnd, Seq(col("x"), col("y")), grid = g)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(got == expected, s"grid=$g")
    }
  }

  test("maximize via negation: min price / max size frontier") {
    val df = Seq(
      (1L, 10.0, 5.0),  // cheap+big: skyline
      (2L, 10.0, 5.0),  // exact duplicate: also skyline (ties kept)
      (3L, 12.0, 5.0),  // dominated by 1 (pricier, same size)
      (4L, 8.0, 2.0),   // cheaper but smaller: skyline
      (5L, 15.0, 9.0),  // biggest: skyline
      (6L, 15.0, 8.0),  // dominated by 5
    ).toDF("id", "price", "sz")
    val got = Skyline.of(df, Seq(col("price"), -col("sz")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("single criterion degenerates to the global min (with ties)") {
    val df = Seq((1L, 3.0), (2L, 1.0), (3L, 1.0), (4L, 2.0)).toDF("id", "v")
    val got = Skyline.of(df, Seq(col("v")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("all-identical input: every row survives") {
    val df = (1 to 50).map(i => (i.toLong, 1.0, 2.0)).toDF("id", "x", "y")
    assert(Skyline.of(df, Seq(col("x"), col("y"))).count() == 50)
  }
}
