package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite bounded-window range joins into exploded
  * equi-joins.
  *
  * A join whose only condition is `r > l AND r <= l + K` (K a small
  * integral literal) has no equi-key, so Spark plans a broadcast
  * nested-loop join — O(|L|·|R|) comparisons, the single worst scale
  * trap in pair-generation workloads (near-dup candidate windows,
  * id-adjacency joins). But the predicate admits an exact equi form:
  * explode each left row into its K window values `l + 1 … l + K` and
  * equi-join that value against `r`. Cost becomes one shuffle of
  * K·|L| + |R| rows — linear, AQE-eligible, skew-splittable.
  *
  * The rewrite preserves semantics exactly: the window values
  * enumerate precisely the integers satisfying the original strict/
  * inclusive bounds, and integral overflow cannot occur short of
  * Long.MaxValue − K (guarded by K ≤ MaxWindow).
  *
  * Registered via `GraftExtensions` (builder) or
  * `spark.experimental.extraOptimizations` (live session).
  */
object RangeJoinToEquiJoin extends Rule[LogicalPlan] {

  val MaxWindow = 64L

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = cond match {
    // r > l AND r <= l + K   (all four orientations of the conjuncts)
    case And(a, b) =>
      val pair = extract(a, b, left, right).orElse(extract(b, a, left, right))
      pair.map { case (lExpr, rExpr, k) =>
        val windowVals = (1L to k).map { d =>
          val lit = if (lExpr.dataType == LongType) Literal(d)
            else Literal(d.toInt)
          Add(lExpr, lit)
        }
        val probe = AttributeReference("__window_probe", lExpr.dataType,
          nullable = lExpr.nullable)()
        val gen = Generate(
          Explode(CreateArray(windowVals)),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(probe),
          child = left)
        val equi = Join(gen, right, Inner,
          Some(EqualTo(probe, rExpr)), hint)
        Project(j.output, equi)
      }

    case _ => None
  }

  /** Match (r > l, r <= l + K) with r from one side, l from the other. */
  private def extract(gt: Expression, le: Expression,
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    val fromLeft = (e: Expression) => e.references.subsetOf(left.outputSet)
    val fromRight = (e: Expression) => e.references.subsetOf(right.outputSet)
    (gt, le) match {
      case (GreaterThan(r1, l1), LessThanOrEqual(r2, Add(l2, Literal(k, t), _)))
          if r1.semanticEquals(r2) && l1.semanticEquals(l2) &&
            fromRight(r1) && fromLeft(l1) &&
            (t == LongType || t == IntegerType) &&
            integral(l1) && integral(r1) =>
        val kv = k match {
          case i: Int => i.toLong
          case l: Long => l
          case _ => return None
        }
        if (kv >= 1 && kv <= MaxWindow) Some((l1, r1, kv)) else None
      // mirrored: l < r AND r <= l + K  is normalized by Catalyst to the
      // GreaterThan form above; LessThan(l, r) appears pre-normalization
      case (LessThan(l1, r1), LessThanOrEqual(r2, Add(l2, Literal(k, t), _)))
          if r1.semanticEquals(r2) && l1.semanticEquals(l2) &&
            fromRight(r1) && fromLeft(l1) &&
            (t == LongType || t == IntegerType) &&
            integral(l1) && integral(r1) =>
        val kv = k match {
          case i: Int => i.toLong
          case l: Long => l
          case _ => return None
        }
        if (kv >= 1 && kv <= MaxWindow) Some((l1, r1, kv)) else None
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType
}
