package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnicodeNormExprSpec extends SparkSpec {

  import spark.implicits._

  private val decomposed = "café" // cafe + combining acute
  private val composed = "café"

  test("NFC composes combining sequences (codegen path)") {
    val got = Seq(decomposed, composed, "plain ascii")
      .toDF("s")
      .select(UnicodeNormExpr.unicodeNorm($"s").as("n"))
      .as[String].collect().toSeq
    assert(got == Seq(composed, composed, "plain ascii"))
  }

  test("matches the JDK normalizer on mixed inputs, all forms") {
    val inputs = Seq(decomposed, composed, "Å", "Å", "ﬁnd",
      "тест", "", "no diacritics at all")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = inputs.toDF("s")
        .select(UnicodeNormExpr.unicodeNorm($"s", form).as("n"))
        .as[String].collect().toSeq
      val want = inputs.map(
        Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(got == want, s"form $form")
    }
  }

  test("NFKC folds compatibility forms (ligature)") {
    val got = Seq("ﬁnd").toDF("s")
      .select(UnicodeNormExpr.unicodeNorm($"s", "NFKC").as("n"))
      .as[String].collect().head
    assert(got == "find")
  }

  test("null propagates; normalization is idempotent") {
    val got = Seq(Option(decomposed), None).toDF("s")
      .select(UnicodeNormExpr.unicodeNorm(
        UnicodeNormExpr.unicodeNorm($"s")).as("n"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some(composed), None))
  }

  test("registered SQL function unicode_norm") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      s"SELECT unicode_norm('$decomposed') AS a, " +
        s"unicode_norm('ﬁnd', 'NFKC') AS b")
      .as[(String, String)].collect().head
    assert(got == ((composed, "find")))
  }
}
