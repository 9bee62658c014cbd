package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The kernel is pinned BIT-FOR-BIT to the oracle engine: every
  * expected value below is DuckDB's own `jaro_winkler_similarity`
  * output for that pair (probed empirically — including the
  * non-obvious corners: two empty strings score 0.0, not 1.0, and the
  * Winkler prefix bonus applies only when the Jaro score EXCEEDS 0.7).
  * Exact `==` on doubles is deliberate: link_fuzzy_names hash-compares
  * the raw double against the oracle, so a 1-ulp drift here is a
  * correctness failure, not a rounding nit.
  */
class JaroWinklerExprSpec extends SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("pinned to DuckDB jaro_winkler_similarity, bit-for-bit") {
    val pinned = Seq(
      ("MARTHA", "MARHTA") -> 0.9611111111111111,
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("", "") -> 0.0, // either side empty => 0, even both
      ("a", "") -> 0.0,
      ("abc", "abc") -> 1.0,
      ("ab", "ba") -> 0.0, // window = 0 at len 2: adjacent swap misses
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("Customer#000001", "Customer#000010") -> 0.9866666666666667,
      ("aaaaaaaaaa", "aaaaaaaaab") -> 0.96,
      ("a", "a") -> 1.0,
      ("abcd", "abce") -> 0.8833333333333334,
      ("pennsylvania", "pencilvaneya") -> 0.8314814814814815,
      // jaro <= 0.7 with a shared prefix: the bonus must NOT apply
      ("abqqqqqq", "abzzzzzz") -> 0.5,
      ("ab", "ax") -> 0.6666666666666666,
      ("abcdxxxxxx", "abcdyyyyyy") -> 0.6,
      ("abcq", "abcz") -> 0.8833333333333334)
    pinned.foreach { case ((a, b), expected) =>
      val got = jw(a, b)
      assert(java.lang.Double.compare(got, expected) == 0,
        s"($a, $b): got $got expected $expected")
    }
  }

  test("codegen'd column path == kernel; nulls propagate") {
    val rows = Seq(("small ring", "smll rng"), ("hot gear", "ht gr"),
      ("blue bolt", "red widget"), ("", "x"))
    val got = rows.toDF("a", "b")
      .select(JaroWinklerExpr.jaroWinkler(col("a"), col("b")).as("sim"))
      .as[Double].collect().toSeq
    rows.zip(got).foreach { case ((a, b), g) =>
      assert(java.lang.Double.compare(g, jw(a, b)) == 0, s"($a, $b)")
    }
    val withNull = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
      .select(JaroWinklerExpr.jaroWinkler(col("a"), col("b")).as("sim"))
      .collect()
    assert(withNull.head.isNullAt(0), "null input must yield null")
  }

  test("properties: symmetry, [0,1] range, identity, boost monotone") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "ring", "widget",
      "x", "qz", "")
    val s = Gen.chooseNum(0, 5)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(s, s) { (a, b) =>
        val ab = jw(a, b)
        val ba = jw(b, a)
        java.lang.Double.compare(ab, ba) == 0 &&
          ab >= 0.0 && ab <= 1.0 &&
          (a.isEmpty || jw(a, a) == 1.0)
      })
    assert(res.passed, res.status.toString)
  }
}
