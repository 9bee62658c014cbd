package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Per-row kernel for [[QuantizeExpr]]: int8 symmetric quantization
  * stats of one float vector in a single fused pass. Static so the
  * generated code can call it directly.
  *
  * Bit-identical to the declarative formulation in `embed_quantize`
  * (asserted in `QuantizeExprSpec`):
  *
  *  - absmax  = array_max(transform(e, abs))  — Double.compare max, so
  *    NaN ranks greatest exactly like Spark's array ordering;
  *  - scale   = 127/absmax when absmax > 0 else 0;
  *  - q_i     = round(x_i * scale) with Spark's Round semantics for
  *    doubles — `BigDecimal.valueOf(v).setScale(0, HALF_UP)`, i.e.
  *    HALF_UP over the SHORTEST DECIMAL representation. A naive
  *    `floor(v + 0.5)` differs: for v = 0.49999999999999994 the float
  *    add rounds up to 1.0 where the decimal path yields 0;
  *  - n_zero  = count(q_i == 0);
  *  - max_abs_err = array_max(|x_i − q_i/scale|) when scale > 0 else 0.
  *
  * NaN inputs: comparisons follow Spark's double ordering (NaN ranks
  * greatest), so a NaN component gives absmax = NaN, scale = NaN and
  * max_abs_err = NaN, while each q_i = (NaN).toInt = 0 (Java d2i).
  * The declarative form is NOT total here — under ANSI mode (the
  * Spark 4 default and this engine's config) its `round(x*scale)
  * .cast("int")` throws CAST_OVERFLOW on NaN — so the kernel extends
  * it with the natural NaN-propagating semantics instead of matching
  * an error (pinned in QuantizeExprSpec).
  */
object Quantize {

  private def roundHalfUp(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var absmax = java.lang.Double.NEGATIVE_INFINITY
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble)
      if (java.lang.Double.compare(a, absmax) > 0) absmax = a
      i += 1
    }
    // Double.compare, not `>`: Spark's binary comparison ranks NaN
    // greater than every double, so a NaN absmax must take the
    // 127/absmax branch (scale = NaN) exactly as `when(absmax > 0, …)`
    // does — Java's `NaN > 0.0` is false and would silently yield
    // scale = 0. Same for the max_abs_err guard below.
    val scale =
      if (java.lang.Double.compare(absmax, 0.0) > 0) 127.0 / absmax else 0.0
    val scalePos = java.lang.Double.compare(scale, 0.0) > 0
    var nZero = 0
    var maxErr = java.lang.Double.NEGATIVE_INFINITY
    i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      val q = roundHalfUp(x * scale).toInt
      if (q == 0) nZero += 1
      if (scalePos) {
        val e = math.abs(x - q.toDouble / scale)
        if (java.lang.Double.compare(e, maxErr) > 0) maxErr = e
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n, scale, nZero, if (scalePos) maxErr else 0.0))
  }
}

/** Native Catalyst expression for int8 embedding-quantization stats:
  * one primitive loop per row inside whole-stage codegen, replacing a
  * declarative form built from `transform`/`zip_with`/`filter` whose
  * higher-order lambdas evaluate interpreted and re-walk the array once
  * per output column (the RollingHashExpr lesson applied to vectors).
  * Returns struct(n_dims, scale, n_zero, max_abs_err).
  */
case class QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_dims", IntegerType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("n_zero", IntegerType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_stats expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Quantize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Quantize.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeExpr = copy(child = newChild)
}

object QuantizeExpr {
  /** Column-API entry point: `quantize_stats(embedding)`. */
  def quantizeStats(emb: Column): Column =
    GraftBridge.columnOf(QuantizeExpr(GraftBridge.expressionOf(emb)))
}
