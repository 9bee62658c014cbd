package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.functions.CosineSimilarityExpr.cosineSim

class CosineSimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)), // identical
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)), // orthogonal
    (3L, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)), // opposite
    (4L, Array(0.3f, -0.7f, 0.2f), Array(0.1f, 0.4f, -0.9f)),
  ).toDF("id", "a", "b")

  test("native expression matches known values") {
    val res = vecs.select($"id", cosineSim($"a", $"b").as("cos"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(res(1L) - 1.0) < 1e-12)
    assert(math.abs(res(2L)) < 1e-12)
    assert(math.abs(res(3L) + 1.0) < 1e-12)
  }

  test("native expression is bit-identical to the declarative fold") {
    val both = vecs.select(
      cosineSim($"a", $"b").as("native"),
      VectorFunctions.cosine($"a", $"b").as("fold"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, f) => assert(n == f, s"$n != $f") }

    // and on real embeddings
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea")).filter($"ia" < 20)
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb")).filter($"ib" < 20)
    val pairs = a.crossJoin(b)
      .select(cosineSim($"ea", $"eb").as("native"),
        VectorFunctions.cosine($"ea", $"eb").as("fold"))
      .as[(Double, Double)].collect()
    assert(pairs.length == 400)
    pairs.foreach { case (n, f) => assert(n == f, s"$n != $f") }
  }

  test("null propagates, zero vector yields NaN") {
    val edge = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
    ).toDF("id", "a", "b")
      .union(Seq((2L, null.asInstanceOf[Array[Float]], Array(1.0f, 1.0f)))
        .toDF("id", "a", "b"))
    val res = edge.select($"id", cosineSim($"a", $"b").as("cos"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(res(1L).exists(_.isNaN))
    assert(res(2L).isEmpty)
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs_test")
    val res = spark.sql(
      "SELECT id, cosine_sim(a, b) AS cos FROM vecs_test WHERE id = 1")
      .as[(Long, Double)].head()
    assert(math.abs(res._2 - 1.0) < 1e-12)
  }
}
