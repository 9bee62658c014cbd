package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-ordered triangle counting vs known closed forms (K_n, stars,
  * cycles) and the definitional x<y<z enumeration on a random graph —
  * plus input hygiene (reversed duplicates, self-loops) and partition
  * invariance.
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]) = es.toDF("src", "dst")

  private def counts(es: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edgesDf(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node closes C(3,2)=3 triangles; total = 4") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = counts(k4)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("star and cycle are triangle-free") {
    assert(counts((1L to 6L).map(i => (0L, i))).isEmpty)
    assert(counts((0L to 5L).map(i => (i, (i + 1) % 6))).isEmpty)
  }

  test("reversed duplicates and self-loops don't change the count") {
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val dirty = k3 ++ k3.map(_.swap) ++ Seq((1L, 1L), (2L, 2L))
    assert(counts(dirty) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graph == definitional x<y<z enumeration") {
    val es = (for (a <- 0L until 40L; b <- (a + 1) until 40L
      if (a * 7919 + b * 104729) % 5 == 0) yield (a, b)).toVector
    val set = es.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (x, y) <- es; z <- (y + 1) until 40L
      if set.contains((y, z)) && set.contains((x, z))
    } { brute(x) += 1; brute(y) += 1; brute(z) += 1 }
    assert(counts(es) == brute.toMap)
  }

  test("partition invariance") {
    val es = (for (a <- 0L until 30L; b <- (a + 1) until 30L
      if (a + b) % 3 == 0) yield (a, b)).toVector
    val one = Triangles.perNode(edgesDf(es).repartition(1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Triangles.perNode(edgesDf(es).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
