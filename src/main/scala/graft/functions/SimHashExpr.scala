package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row kernel for [[SimHashExpr]], a plain object so generated code
  * calls it as a static method. Bit-identical to the declarative
  * `Dedup.simhashFromHashes`: per bit i, sum ±1 over each token-hash's
  * bit i; fingerprint bit i is set iff the sum is positive.
  */
object SimHash {
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = hashes.getLong(t)
      var i = 0
      while (i < 64) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }
}

/** Native Catalyst expression for the 64-bit SimHash of a token-hash
  * array: one primitive O(tokens·64) loop per row inside whole-stage
  * codegen, versus 64 interpreted `aggregate` folds in the declarative
  * form. Output contract matches `Dedup.simhashFromHashes` exactly
  * (asserted in `DedupSpec`), so the two forms are interchangeable.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
  /** Column-API entry point: `simhash64(tokenHashes)`. */
  def simhash64(hashes: Column): Column =
    GraftBridge.columnOf(SimHashExpr(GraftBridge.expressionOf(hashes)))
}
