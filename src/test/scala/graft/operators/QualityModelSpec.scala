package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based quality filtering ([[QualityModel]]): distributed
  * full-batch logistic regression over the engine's quality features,
  * applied as a pure literal-weight Column.
  */
class QualityModelSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(7)

  /** English-ish prose: stopword-dense, punctuated, varied vocab. */
  private def goodDoc(i: Int): String = {
    val subjects = Seq("engine", "query", "table", "batch", "reader")
    val verbs = Seq("scans", "merges", "prunes", "commits", "folds")
    val objs = Seq("partitions", "buckets", "manifests", "files", "rows")
    (0 until 4).map { s =>
      s"the ${subjects((i + s) % 5)} ${verbs((i + 2 * s) % 5)} a set " +
        s"of ${objs((i + 3 * s) % 5)} and is ready to continue, item " +
        s"${i * 10 + s}."
    }.mkString(" ")
  }

  /** Garbage: no stopwords, no sentence punctuation, repetitive. */
  private def badDoc(i: Int): String = {
    val junk = Seq("xkcd", "zzzz", "qwrt", "bbbb", "mmmm")
    (0 until 12).map(s => junk((i + s) % 3)).mkString(" ")
  }

  private lazy val labeled = (
    (0 until 150).map(i => (goodDoc(i), 1.0)) ++
      (0 until 150).map(i => (badDoc(i), 0.0))
  ).map { case (t, y) => (t, y, rng.nextDouble()) }
    .toDF("text", "label", "holdout")

  test("training separates planted good/bad docs on a holdout") {
    val train = labeled.filter($"holdout" >= 0.25)
    val test = labeled.filter($"holdout" < 0.25)
    val model = QualityModel.train(train, "text", "label")
    val scored = test.withColumn("logit",
      QualityModel.score(model)($"text"))
    val acc = scored.select(
      avg(when(($"logit" > 0.0) === ($"label" === 1.0), 1.0)
        .otherwise(0.0))).head().getDouble(0)
    assert(acc >= 0.95, s"holdout accuracy $acc below 0.95")
    // and the loss actually went somewhere: better than the zero
    // model's ln 2
    val trained = QualityModel.logLoss(train, "text", "label", model)
    assert(trained < 0.4,
      s"trained log-loss $trained not clearly below ln 2")
  }

  test("more iterations never worsen the convex training loss") {
    val l10 = QualityModel.logLoss(labeled, "text", "label",
      QualityModel.train(labeled, "text", "label", iters = 10))
    val l60 = QualityModel.logLoss(labeled, "text", "label",
      QualityModel.train(labeled, "text", "label", iters = 60))
    assert(l60 <= l10 + 1e-9, s"loss rose with iterations: $l10 -> $l60")
  }

  test("filter keeps scored-good rows; score is partitioning-invariant") {
    val model = QualityModel.train(labeled, "text", "label")
    val kept = QualityModel.filter(labeled, "text", model)
      .select("label").as[Double].collect()
    assert(kept.length > 100 && kept.sum / kept.length >= 0.95)
    // literal-weight per-row arithmetic: identical scores at any
    // partitioning (the battery pins the same property vs DuckDB)
    val a = labeled.repartition(1)
      .select(QualityModel.scoreScaled(model)($"text"))
      .as[Long].collect().sorted.toSeq
    val b = labeled.repartition(7)
      .select(QualityModel.scoreScaled(model)($"text"))
      .as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}
