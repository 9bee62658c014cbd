package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{CosineSimilarityExpr, JaroWinklerExpr, MinHashExpr, QuantizeExpr, RollingHashExpr, SimHashExpr, UnicodeNormExpr}

/** Session extensions exposing the engine's native expressions to SQL
  * users. Two registration paths:
  *
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions` (cluster-wide), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * After registration: `SELECT cosine_sim(a.embedding, b.embedding) ...`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectResolutionRule(_ => graft.plans.GraftDml)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinToEquiJoin)
    e.injectOptimizerRule(_ => graft.plans.TimePredicateRewrite)
    e.injectOptimizerRule(_ => graft.plans.MvRewrite)
    e.injectOptimizerRule(_ => graft.plans.MergePruning)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  private type FunctionBuilder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarityExpr(exprs.head, exprs(1))
      }),
    (new FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_fp"),
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 3,
          "rolling_fp takes (text[, k[, keep]])")
        def intArg(i: Int, default: Int): Int =
          if (exprs.length > i) exprs(i) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other =>
              throw new IllegalArgumentException(
                s"rolling_fp arg ${i + 1} must be a literal int, got $other")
          } else default
        RollingHashExpr(exprs.head, intArg(1, 8), intArg(2, 16))
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64 takes exactly 1 argument")
        SimHashExpr(exprs.head)
      }),
    (new FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[QuantizeExpr].getName, "quantize_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "quantize_stats takes exactly 1 argument")
        QuantizeExpr(exprs.head)
      }),
    (new FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[MinHashExpr].getName, "minhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 3,
          "minhash64 takes (hashes[, numHashes[, seed]])")
        def longArg(i: Int, default: Long): Long =
          if (exprs.length > i) exprs(i) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toLong
            case other =>
              throw new IllegalArgumentException(
                s"minhash64 arg ${i + 1} must be a literal, got $other")
          } else default
        MinHashExpr(exprs.head, longArg(1, 64L).toInt, longArg(2, 42L))
      }),
    (new FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormExpr].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2,
          "unicode_norm takes (text[, form])")
        val form = if (exprs.length == 2) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null =>
            v.toString.toUpperCase
          case other => throw new IllegalArgumentException(
            s"unicode_norm form must be a literal string, got $other")
        } else "NFC"
        UnicodeNormExpr(exprs.head, form)
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinklerExpr(exprs.head, exprs(1))
      }),
  )

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
