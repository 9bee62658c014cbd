package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row kernel for [[MinHashExpr]], a plain object so generated code
  * calls it statically. Permutation parameters come from the SAME
  * seeded sequence as the declarative `Dedup.minhashFromHashes`
  * (`Dedup.perms`), so the two forms are bit-identical; the (a, b)
  * tables are memoized per (numHashes, seed).
  */
object MinHash {
  private val MersennePrime = 2147483647L

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def params(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((numHashes, seed), { _ =>
      val ps = graft.operators.Dedup.perms(numHashes, seed)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  def compute(xs: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = params(numHashes, seed)
    val n = xs.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = as(i)
      val b = bs(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        // xs are pre-reduced mod p, so a·x fits in a long (a, x < 2^31)
        val h = (a * xs.getLong(j) + b) % MersennePrime
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native Catalyst expression for the MinHash signature of a
  * pre-materialized (mod p) feature-hash array: one primitive
  * O(perms·features) loop per row inside whole-stage codegen, versus
  * `numHashes` interpreted transform+array_min folds in the
  * declarative form. `DedupSpec` pins bit-identity.
  *
  * Empty feature arrays yield Long.MaxValue per slot in BOTH forms
  * (declarative `array_min` of an empty transform is null — the kernel
  * is only used behind `bandedSignatures`, whose inputs always carry
  * at least one feature by construction of `Dedup.features`).
  */
case class MinHashExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHash.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash.compute($c, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashExpr = copy(child = newChild)
}

object MinHashExpr {
  /** Column-API entry point. */
  def minhash(xs: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    GraftBridge.columnOf(
      MinHashExpr(GraftBridge.expressionOf(xs), numHashes, seed))
}
