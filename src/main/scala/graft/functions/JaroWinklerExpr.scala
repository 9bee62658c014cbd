package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity (Winkler '90 over Jaro '89), the
  * record-linkage comparator: Jaro similarity from in-window character
  * matches and half-transpositions, plus a prefix bonus
  * `l·0.1·(1−jaro)` (common prefix capped at 4) applied only when the
  * Jaro score exceeds 0.7 — the classic "boost threshold".
  *
  * Semantics are pinned bit-for-bit to the DuckDB oracle's
  * `jaro_winkler_similarity` (probed empirically, JaroWinklerExprSpec):
  *  - either side empty ⇒ 0.0 (INCLUDING both empty — not 1.0);
  *  - match window = max(len)/2 − 1, floored at 0;
  *  - half-transpositions = misordered matches / 2 (integer);
  *  - final double arithmetic in the exact association
  *    `(m/n + m/m' + (m−t)/m) / 3`, then `j + l·0.1·(1−j)`, so the
  *    emitted DOUBLE hash-matches the oracle, not just rounds to it.
  *
  * Cost: O(n·window) char scans with a boolean match mask — the same
  * shape every published implementation uses; no allocation beyond the
  * two masks. Char-based (BMP-safe); the corpus contract is ASCII.
  */
object JaroWinkler {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val mask1 = new Array[Boolean](n)
    val mask2 = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val hi = math.min(m, i + window + 1)
      var j = math.max(0, i - window)
      var found = false
      while (j < hi && !found) {
        if (!mask2(j) && t.charAt(j) == c) {
          mask1(i) = true; mask2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (mask1(i)) {
        while (!mask2(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val half = trans / 2
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - half) / md) / 3.0
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(n, m))
      var l = 0
      while (l < cap && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** `jaro_winkler(left, right)`: whole-stage-codegen'd call into the
  * static kernel above.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (string, string), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Column-API entry point. */
  def jaroWinkler(l: Column, r: Column): Column =
    GraftBridge.columnOf(JaroWinklerExpr(
      GraftBridge.expressionOf(l), GraftBridge.expressionOf(r)))
}
