package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernel for [[RollingHashExpr]], kept as a plain object so the
  * generated code can call it as a static method. Semantics are
  * bit-identical to the declarative
  * `TextFunctions.rollingHashFromCodes(charCodes(text))` formulation:
  * code-point windows, h = Σ c·257^(k-1-j) mod 1e9+7, distinct minima
  * sorted ascending, first `keep` kept; positions past the end of short
  * docs contribute 0.
  */
object RollingHash {
  final val B = 257L
  final val M = 1000000007L

  def compute(u: UTF8String, k: Int, keep: Int): ArrayData = {
    val s = u.toString
    val len = s.length
    val n = s.codePointCount(0, len)
    val codes = new Array[Int](n)
    var i = 0
    var idx = 0
    while (idx < len) {
      val cp = s.codePointAt(idx)
      codes(i) = cp
      i += 1
      idx += Character.charCount(cp)
    }
    val w = math.max(n - k + 1, 1)
    val hs = new Array[Long](w)
    var p = 0
    while (p < w) {
      var h = 0L
      var j = 0
      while (j < k) {
        val c = if (p + j < n) codes(p + j) else 0
        h = (h * B + c) % M
        j += 1
      }
      hs(p) = h
      p += 1
    }
    java.util.Arrays.sort(hs)
    val cap = math.min(keep, w)
    val out = new Array[Long](cap)
    var nOut = 0
    p = 0
    while (p < w && nOut < cap) {
      if (p == 0 || hs(p) != hs(p - 1)) {
        out(nOut) = hs(p)
        nOut += 1
      }
      p += 1
    }
    new GenericArrayData(if (nOut == cap) out
      else java.util.Arrays.copyOf(out, nOut))
  }
}

/** Native Catalyst expression for the Karp-Rabin winnowing fingerprint:
  * one tight primitive loop per row inside whole-stage codegen, versus
  * the declarative `charCodes` + k-1 `zip_with` form whose higher-order
  * lambdas evaluate interpreted (~20M boxed lambda calls over the sf0.1
  * corpus). Output contract matches `TextFunctions.rollingHashFromCodes`
  * exactly (asserted in `RollingHashExprSpec`), so the two forms are
  * interchangeable in pipelines.
  */
case class RollingHashExpr(child: Expression, k: Int, keep: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fp expects a string column, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], k, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c, $k, $keep);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashExpr = copy(child = newChild)
}

object RollingHashExpr {
  /** Column-API entry point: `rolling_fp(text)`. */
  def rollingFp(text: Column, k: Int = 8, keep: Int = 16): Column =
    GraftBridge.columnOf(
      RollingHashExpr(GraftBridge.expressionOf(text), k, keep))
}
