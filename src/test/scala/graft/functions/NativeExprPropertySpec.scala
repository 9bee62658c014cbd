package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.operators.Dedup

/** Property tests pinning the native codegen'd kernels to their
  * declarative formulations on arbitrary inputs — the bit-identity
  * contract that makes the fast forms safe drop-in replacements.
  * Strings include multi-byte code points; token-hash arrays cover the
  * full signed-long range.
  */
class NativeExprPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, minTests: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  // words plus some multi-byte/unicode tokens and empty-ish shapes
  private val tokenGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.oneOf("héllo", "wörld", "データ", "émigré", "ß"),
    1 -> Gen.const(""))
  private val textGen: Gen[String] =
    Gen.listOfN(12, tokenGen).map(_.mkString(" ").trim)

  test("rolling_fp native == declarative for arbitrary (incl. unicode) text") {
    check(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
        df.select(
          RollingHashExpr.rollingFp($"text").as("n"),
          TextFunctions.rollingHashFromCodes(
            TextFunctions.charCodes($"text")).as("d"))
          .filter(!($"n" <=> $"d")).count() == 0L
      }
    })
  }

  test("simhash64 native == declarative for arbitrary hash arrays") {
    val hashesGen = Gen.listOfN(10,
      Gen.choose(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(Gen.listOfN(6, hashesGen)) { arrays =>
      arrays.isEmpty || {
        val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
          .toDF("id", "th")
        df.select(
          SimHashExpr.simhash64($"th").as("n"),
          Dedup.simhashFromHashes($"th").as("d"))
          .filter(!($"n" <=> $"d")).count() == 0L
      }
    })
  }

  test("cosine_sim native == declarative fold for arbitrary float vectors") {
    val vecGen = Gen.listOfN(16,
      Gen.choose(-10.0, 10.0).map(_.toFloat))
    check(Prop.forAll(Gen.listOfN(5, Gen.zip(vecGen, vecGen))) { vs =>
      vs.isEmpty || {
        val df = vs.zipWithIndex
          .map { case ((a, b), i) => (i.toLong, a, b) }
          .toDF("id", "a", "b")
        df.select(
          CosineSimilarityExpr.cosineSim($"a", $"b").as("n"),
          VectorFunctions.cosine($"a", $"b").as("d"))
          .filter(!($"n" <=> $"d")).count() == 0L
      }
    })
  }
}
