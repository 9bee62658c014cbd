package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering, the FineWeb-Edu / DCLM-style third
  * tier above heuristic gates (cf. Penedo et al. 2024, Li et al.
  * 2024): a tiny linear classifier over cheap text statistics, trained
  * ON-CLUSTER with full-batch logistic-regression gradient descent and
  * applied as a pure codegen'd `Column` — so the 100 TB pass costs the
  * same as the heuristic gates it extends (no UDF, no shuffle, no
  * model server).
  *
  * Scale shape:
  *  - features are per-row `Column` arithmetic over the text (one
  *    regex pass + tokenizer — the same kernels the heuristic gates
  *    use);
  *  - training is `iters` scalar AGGREGATES over a cached feature
  *    frame: each gradient step is one map-side-combined sum of k+1
  *    doubles per partition (full-batch GD; for a trillion-row corpus
  *    train on a bounded `sample` — the estimator is n-invariant);
  *  - inference is `score(model)(text)` — a literal-weight expression,
  *    whole-stage-codegen'd, embarrassingly parallel.
  *
  * Determinism: the SCORE is pure per-row IEEE-754 `+ * /` on doubles
  * (no exp/log — the decision threshold is applied to the LOGIT, which
  * is sigmoid-monotone), so identical inputs score identically on any
  * engine; the battery's `quality_model_score` query pins the scaled
  * logit against DuckDB bit-for-bit. Training sums float gradients
  * across partitions and is deterministic only up to reduction order —
  * specs assert separation quality, never exact weights.
  */
object QualityModel {

  /** Ordered feature vector: name -> per-row expression. All bounded
    * [0, ~1] by construction (ratios and a saturating length), so
    * gradient descent needs no standardization pass. An EMPTY text
    * yields NaN ratios (0/0) that poison gradient sums — run the
    * pipeline's length gate first (curation always does); the score
    * of such a row is NaN on every engine identically.
    */
  def features(text: Column): Seq[(String, Column)] = {
    val nTokens = TextFunctions.tokenCount(text).cast("double")
    Seq(
      // saturating length signal: 0 for empty-ish, -> 1 for long docs
      "len_sat" -> (nTokens / (nTokens + lit(20.0))),
      // function-word density: the strongest natural-language marker
      "stop_ratio" ->
        (TextFunctions.stopwordCount(text).cast("double") / nTokens),
      // sentence punctuation per character
      "punct_ratio" -> (TextFunctions.punctCount(text).cast("double") /
        length(text).cast("double")),
      // vocabulary diversity: near 1 for natural prose, lower for
      // repetitive or boilerplate text
      "distinct_ratio" ->
        (TextFunctions.distinctTokenCount(text).cast("double") / nTokens))
  }

  /** A trained linear quality model: `logit = bias + w · f(text)`;
    * keep when `logit > threshold` (threshold in logit space — 0.0 is
    * the 0.5-probability cut).
    */
  final case class Model(bias: Double, weights: Seq[Double]) {
    require(weights.size == featureNames.size,
      s"expected ${featureNames.size} weights, got ${weights.size}")
  }

  def featureNames: Seq[String] = features(lit("")).map(_._1)

  /** The logit as a left-associated literal-weight expression —
    * `((bias + w1·f1) + w2·f2) + …` — the exact shape the oracle SQL
    * mirrors, so the scaled score is reproducible bit-for-bit.
    */
  def score(model: Model)(text: Column): Column =
    features(text).zip(model.weights).foldLeft(lit(model.bias)) {
      case (acc, ((_, f), w)) => acc + lit(w) * f
    }

  /** Integer-scaled logit (`floor(logit · 1e6)`) for engine-exact
    * comparison and stable ordering — the battery's published form.
    */
  def scoreScaled(model: Model)(text: Column): Column =
    floor(score(model)(text) * lit(1000000.0)).cast("long")

  /** Keep rows the model scores above `threshold` (logit space). */
  def filter(df: DataFrame, textCol: String, model: Model,
      threshold: Double = 0.0): DataFrame =
    df.filter(score(model)(col(textCol)) > lit(threshold))

  /** Full-batch logistic regression on `labelCol` (1.0 = keep /
    * high-quality, 0.0 = drop): `iters` gradient steps, each ONE
    * map-side-combined aggregate over the cached feature frame.
    * Features are bounded [0, 1], so a plain constant learning rate
    * converges without standardization; weights start at zero (the
    * symmetric start for a convex loss).
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 60, learningRate: Double = 2.0): Model = {
    val fcols = features(col(textCol))
    val feats = df.select(
      (col(labelCol).cast("double").as("_y") +:
        fcols.map { case (n, c) => c.as(n) }): _*)
      .cache()
    try {
      val n = feats.count().toDouble
      require(n > 0, "cannot train a quality model on an empty frame")
      var bias = 0.0
      var w = Array.fill(fcols.size)(0.0)
      for (_ <- 0 until iters) {
        // z = bias + w·x as a literal expression; residual = p - y
        val z = fcols.indices.foldLeft(lit(bias)) {
          case (acc, i) => acc + lit(w(i)) * col(fcols(i)._1)
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val resid = (p - col("_y")).as("_r")
        val grads = feats.select(
          (sum(resid) +:
            fcols.indices.map(i =>
              sum(resid * col(fcols(i)._1)))): _*)
          .head()
        bias -= learningRate * grads.getDouble(0) / n
        w = w.indices.map(i =>
          w(i) - learningRate * grads.getDouble(i + 1) / n).toArray
      }
      Model(bias, w.toSeq)
    } finally feats.unpersist()
  }

  /** Training-set log-loss of a model — the convexity probe specs
    * assert decreases across training.
    */
  def logLoss(df: DataFrame, textCol: String, labelCol: String,
      model: Model): Double = {
    val z = score(model)(col(textCol))
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    // clamp away exact 0/1 so the loss stays finite
    val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
    val y = col(labelCol).cast("double")
    df.select(avg(-(y * log(pc) +
      (lit(1.0) - y) * log(lit(1.0) - pc)))).head().getDouble(0)
  }
}
