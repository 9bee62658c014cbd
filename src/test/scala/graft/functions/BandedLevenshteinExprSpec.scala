package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The banded kernel must agree with Spark's full Levenshtein wherever
  * the true distance is ≤ k, and report exactly k+1 beyond — the
  * contract that makes `dist ≤ k` filters built on it EXACT.
  */
class BandedLevenshteinExprSpec extends SparkSpec {

  import spark.implicits._

  private def both(pairs: Seq[(String, String)], k: Int)
      : Seq[(Int, Int)] =
    pairs.toDF("a", "b")
      .select(
        BandedLevenshteinExpr.bandedLevenshtein(col("a"), col("b"), k)
          .as("banded"),
        levenshtein(col("a"), col("b")).as("full"))
      .as[(Int, Int)].collect().toSeq

  test("crafted edges: empties, equals, swaps, length gaps") {
    val k = 4
    val pairs = Seq(
      ("", ""), ("", "ab"), ("abcd", ""),
      ("kitten", "sitting"), ("abcd", "abcd"),
      ("abcd", "abdc"), ("aaaa", "bbbb"),
      ("abcdefgh", "abc"),            // length gap 5 > k
      ("prefix match long", "prefix match lonG"),
      ("ab", "ba"))
    both(pairs, k).zip(pairs).foreach { case ((banded, full), p) =>
      val expected = math.min(full, k + 1)
      assert(banded == expected, s"$p: banded=$banded full=$full")
    }
  }

  test("banded == min(full, k+1) for arbitrary token strings") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yz")
    val sentence = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOfN(24, Gen.zip(sentence, sentence)),
        Gen.chooseNum(1, 20)) { (pairs, k) =>
        pairs.isEmpty || both(pairs, k).forall { case (banded, full) =>
          banded == math.min(full, k + 1)
        }
      })
    assert(res.passed, res.status.toString)
  }
}
