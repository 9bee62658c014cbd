package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator extension tier: top-k rows per group as a custom
  * LogicalPlan + Strategy + SparkPlan, registered through the planner
  * extension point.
  *
  * The standard DataFrame formulation — `row_number() OVER (PARTITION
  * BY g ORDER BY score DESC)` then `rk <= k` — SORTS every group in
  * full to keep k rows: O(n log n) per partition and the sort
  * materializes all of it. This operator keeps a k-bounded min-heap
  * per group instead: O(n log k) time, O(groups · k) memory, no sort
  * operator in the plan at all. `requiredChildDistribution` declares
  * the group clustering, so EnsureRequirements inserts exactly the
  * one shuffle the semantics need — the operator composes with AQE
  * and reuses Spark's exchange machinery rather than re-implementing
  * it.
  *
  * (The `TopK.topKUdaf` Aggregator expresses the same bound through
  * the agg path with an array result; this is the whole-operator form
  * that keeps the child's row shape — and the repo's demonstration of
  * extension tier (c): LogicalPlan + Strategy + SparkPlan.)
  *
  * Ties on `score` keep the first-arriving row — pass a unique score
  * (e.g. salt a tiebreaker into low-order bits) for full determinism.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression],
    scoreExpr: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical form. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: per-partition hash of k-bounded min-heaps. */
case class TopKPerGroupExec(groupExprs: Seq[Expression],
    scoreExpr: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Same-group rows must co-locate; Spark plans the shuffle. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { (iter: Iterator[InternalRow]) =>
      val keyProj = UnsafeProjection.create(groupExprs, child.output)
      val score = BindReferences.bindReference(scoreExpr, child.output)
      // min-heap per group (head = smallest kept score, evicted first),
      // ordered by Double.compare — the TOTAL order Spark's sort uses,
      // so NaN ranks above every finite score exactly like the
      // window-rank formulation (IEEE `>` would silently drop NaNs
      // arriving after the heap fills, making results arrival-order-
      // dependent)
      val ord: Ordering[(Double, InternalRow)] =
        (a, b) => java.lang.Double.compare(b._1, a._1)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, InternalRow)]]
      iter.foreach { row =>
        val s = score.eval(row)
        if (s != null) {
          val sc = s.asInstanceOf[Double]
          // probe with the projection's reused buffer; copy the key
          // only when this group is first seen
          val probe = keyProj(row)
          val heap = heaps.getOrElse(probe, {
            val h = mutable.PriorityQueue.empty[(Double, InternalRow)](ord)
            heaps.put(probe.copy(), h)
            h
          })
          if (heap.size < k) heap.enqueue((sc, row.copy()))
          else if (java.lang.Double.compare(sc, heap.head._1) > 0) {
            heap.dequeue()
            heap.enqueue((sc, row.copy()))
          }
        }
      }
      // heap emission order is arbitrary — the operator's contract is
      // the SET of top-k rows per group, like any unordered aggregate
      val out: Iterator[InternalRow] = heaps.valuesIterator.flatMap {
        heap => heap.iterator.map(t => t._2)
      }
      out
    }
}

object TopKPerGroup {

  /** Top-k rows of `df` per `groupCols` by `scoreCol` (descending).
    * Registers the planner strategy on the session if absent.
    */
  def topK(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val child = GraftBridge.planOf(df)
    def attr(name: String): Attribute = child.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val score = Cast(attr(scoreCol), DoubleType)
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), score, k, child))
  }

  /** Idempotent live-session registration (the builder path is
    * `GraftExtensions`, which injects the strategy cluster-wide).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
}
