package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernel for [[WinnowExpr]] — positional winnowed
  * fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003, a public
  * paper) over a TOKEN array:
  *
  *  1. hash every token (FNV-1a over its UTF-8 bytes);
  *  2. polynomial k-gram hash at EVERY position, O(1) per slide
  *     (wrapping 64-bit arithmetic, odd base — exact, no mod bias);
  *  3. winnow: in each window of `w` consecutive k-gram hashes select
  *     the RIGHTMOST minimum — the classic guarantee follows: any
  *     token run of length ≥ w + k − 1 shared by two documents has at
  *     least one selected fingerprint in BOTH.
  *
  * Output: array<struct<pos:int, fp:long>> of the selected (position,
  * fingerprint) pairs, ~2/(w+1) of all positions — the bounded
  * anchor set a corpus-scale exact-span join shuffles instead of
  * every-position n-grams.
  */
object Winnow {
  final val B = 1099511628211L // odd 64-bit FNV prime as the poly base

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = -3750763034362895579L // FNV-1a offset basis
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 1099511628211L
      i += 1
    }
    h
  }

  def compute(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      th(i) = if (u == null) 0L else fnv1a(u.getBytes)
      i += 1
    }
    val m = n - k + 1
    val hs = new Array[Long](m)
    // B^(k-1) for the O(1) slide
    var bk1 = 1L
    i = 1
    while (i < k) { bk1 *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    hs(0) = h
    var p = 1
    while (p < m) {
      h = (h - th(p - 1) * bk1) * B + th(p + k - 1)
      hs(p) = h
      p += 1
    }
    // winnow: rightmost minimum of each w-window, deduped on position
    val win = math.min(w, m)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastSel = -1
    var start = 0
    while (start + win <= m) {
      var sel = start
      var j = start + 1
      while (j < start + win) {
        if (hs(j) <= hs(sel)) sel = j // rightmost min
        j += 1
      }
      if (sel != lastSel) {
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](sel, hs(sel)))
        lastSel = sel
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow(tokens, k, w)` → array<struct<pos, fp>>; see [[Winnow]]. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowExpr = copy(child = newChild)
}

object WinnowExpr {
  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftBridge.columnOf(
      WinnowExpr(GraftBridge.expressionOf(tokens), k, w))
}

/** Exact maximal-run extension around a fingerprint anchor:
  * `span_extend(toksA, posA, toksB, posB, k)` verifies the anchor's
  * k tokens actually match (discarding hash collisions), then extends
  * left and right while tokens are equal, returning
  * struct(start_a, start_b, len) — the maximal common token run
  * containing the anchor (0-based starts) — or null on a collision.
  * Runs on the CANDIDATE PAIR tail only (anchors that already share a
  * fingerprint), so the interpreted eval is output-bound, never the
  * corpus-scan hot path.
  */
case class SpanExtendExpr(toksA: Expression, posA: Expression,
    toksB: Expression, posB: Expression, k: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(toksA, posA, toksB, posB)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("start_a", IntegerType, nullable = false),
    StructField("start_b", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false)))

  override def eval(input: InternalRow): Any = {
    val a = toksA.eval(input).asInstanceOf[ArrayData]
    val b = toksB.eval(input).asInstanceOf[ArrayData]
    val pa = posA.eval(input)
    val pb = posB.eval(input)
    if (a == null || b == null || pa == null || pb == null) return null
    val ia = pa.asInstanceOf[Int]
    val ib = pb.asInstanceOf[Int]
    val na = a.numElements()
    val nb = b.numElements()
    if (ia + k > na || ib + k > nb) return null
    def tok(arr: ArrayData, i: Int): UTF8String = arr.getUTF8String(i)
    def eq(i: Int, j: Int): Boolean = {
      val x = tok(a, i); val y = tok(b, j)
      if (x == null || y == null) x == null && y == null else x.equals(y)
    }
    var i = 0
    while (i < k) { if (!eq(ia + i, ib + i)) return null; i += 1 }
    var lo = 0
    while (ia - lo - 1 >= 0 && ib - lo - 1 >= 0 &&
      eq(ia - lo - 1, ib - lo - 1)) lo += 1
    var hi = k
    while (ia + hi < na && ib + hi < nb && eq(ia + hi, ib + hi)) hi += 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ia - lo, ib - lo, lo + hi))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpanExtendExpr =
    copy(toksA = newChildren(0), posA = newChildren(1),
      toksB = newChildren(2), posB = newChildren(3))
}

object SpanExtendExpr {
  def spanExtend(toksA: Column, posA: Column, toksB: Column,
      posB: Column, k: Int): Column =
    GraftBridge.columnOf(SpanExtendExpr(
      GraftBridge.expressionOf(toksA), GraftBridge.expressionOf(posA),
      GraftBridge.expressionOf(toksB), GraftBridge.expressionOf(posB), k))
}
