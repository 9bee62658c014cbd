package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Transparent materialized-view rewrite — the optimizer half of the
  * maintained-table family. [[graft.cdc.AggView]] keeps per-key
  * algebraic partials fresh incrementally; this rule lets UNCHANGED
  * user queries benefit: an `Aggregate` over the registered base table
  * whose grouping columns are a subset of the view's keys and whose
  * aggregate functions are derivable from the stored partials is
  * rewritten to roll the partials up instead of rescanning the base —
  * the classic partial-rollup rewrite every warehouse MV system
  * performs (the reference has no optimizer at all; this is the
  * capability its users get from the warehouses it exports into).
  *
  * Derivations (view stores per-group `__cnt` plus, per measure m:
  * `__sum_i`, `__min_i`, `__max_i`, `__nncnt_i`):
  *
  *  - count(1)  → coalesce(sum(__cnt), 0)
  *  - count(m)  → coalesce(sum(__nncnt_i), 0)   (non-null rollup)
  *  - sum(m)    → sum(__sum_i)   (cast back when decimal re-widening
  *                                changes the type)
  *  - min(m)    → min(__min_i),  max(m) → max(__max_i)
  *  - avg(m)    → Σ__sum_i / Σ__nncnt_i for DECIMAL m, rebuilt along
  *                Spark's own Average evaluate path (identical operand
  *                types, identical rounding — bit-exact vs the base);
  *                float/double avg bails to the base scan
  *
  * A measure is matched STRUCTURALLY: a bare column, or `cast(col AS
  * t)` with the exact cast the view was declared with — so a query
  * summing a different decimal scale than the view stores is left
  * alone rather than silently approximated. Queries with DISTINCT or
  * FILTER aggregates, expression-valued groupings, non-derivable
  * functions (avg over changing cardinalities is NOT sum/sum-safe
  * for its type semantics), or filters touching non-group columns all
  * bail to the base plan. A `Filter` on group columns is remapped onto
  * the view (it prunes whole groups, which is exactly what the partial
  * table stores).
  *
  * At 100 TB this is the difference between O(|base|) and O(|groups|)
  * per dashboard query: the base scan disappears from the plan (the
  * spec pins the rewritten plan's file source to the view path). The
  * rule runs in the operator-optimization batch (fixed point): a
  * rewritten plan no longer references the base path, so it cannot
  * re-fire.
  *
  * Freshness: for plain [[Mv.create]] views it is the registrar's
  * contract — register after creating, [[Mv.deregister]] before
  * mutating the base in place. For [[graft.cdc.AggView]]-backed
  * registrations the rule is coupled to the transaction log instead:
  * the view's committed state is resolved through its manifest at
  * query time (a refresh needs no re-registration), and when the base
  * is the feed-emitting Compaction table, the rewrite consults both
  * fences and serves the BASE while the view lags behind published
  * feed batches — stale aggregates are never served (MvFreshnessSpec).
  * The registry itself is scoped per SparkSession.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Which view columns hold a measure's partials; an absent kind
    * simply makes that aggregate non-derivable (e.g. an AggView keeps
    * count+sum but no min/max — min/max queries stay on the base).
    * `nncnt` is the per-group NON-NULL count of the measure (r12):
    * it derives `count(m)` directly and, with `sum`, `avg(m)` for
    * DECIMAL measures.
    */
  final case class Partials(sum: Option[String] = None,
      min: Option[String] = None, max: Option[String] = None,
      nncnt: Option[String] = None)

  /** A view maintained by [[graft.cdc.AggView]] under the manifest
    * protocol: the rule resolves its CURRENT committed state (paths +
    * batch-id fence) from the manifest at query time, and — when the
    * base is a [[graft.cdc.Compaction]] table emitting the change feed
    * the view consumes — bails to the base scan whenever the base has
    * published feed batches the view has not applied yet. The
    * convention this checks is the one the engine's own IVM loop uses:
    * `AggView.applyFeed(batchId = <feed batch id>)`.
    */
  final case class AggViewLink(viewDir: String,
      baseTableDir: Option[String])

  /** One registered view: parquet at `viewPath`, keyed by `groupCols`
    * (lowercase), `cntCol` holding per-group row counts, measures
    * keyed by their structural form → partial column names. With
    * `aggView` set, `viewPath` is the AggView table DIR (resolved
    * through its manifest, never listed directly).
    */
  final case class MvDef(viewPath: String, groupCols: Seq[String],
      cntCol: String, measures: Map[String, Partials],
      aggView: Option[AggViewLink] = None)

  /** (session UUID | base path) → the base's registered views. Keyed
    * per session (ADVICE r4): a view registered in one SparkSession
    * must not rewrite aggregates in every other session of the JVM.
    * A base may carry SEVERAL rollups (r10 item 5) — the rewrite
    * picks the cheapest matching one (fewest partial rows).
    */
  private val registry = TrieMap.empty[String, List[MvDef]]

  /** Cached analyzed view scans (FileIndex listing is not free);
    * `newInstance()` re-keys attributes per use-site. For
    * manifest-backed views the cached plan is tagged with the manifest
    * version it resolved, so one driver-side meta read per query
    * detects a refresh and only a REAL refresh pays the re-listing.
    */
  private val viewPlans = TrieMap.empty[String, (Long, LogicalPlan)]

  /** Session discriminator: identity of the active session object —
    * stable for a session's lifetime, distinct across `newSession()`
    * siblings (Spark 4's api-facade SparkSession exposes no
    * sessionUUID to match on).
    */
  private def sessionTag: String =
    Integer.toHexString(System.identityHashCode(SparkSession.active))

  private def sessionKey(path: String): String =
    s"$sessionTag|${normalize(path)}"

  /** Fully-qualified registry key: scheme + authority + path. Dropping
    * the scheme would collide same-pathed tables on DIFFERENT
    * filesystems (file:/warehouse/t vs s3a://bucket/warehouse/t) and
    * serve one's view for the other's data; scheme-less registration
    * paths qualify against the session's default filesystem, the same
    * resolution `spark.read` applies to them.
    */
  private[plans] def normalize(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val q = p.getFileSystem(conf).makeQualified(p).toUri
    // render scheme/authority uniformly: a qualified local path
    // arrives as file:/x or file:///x depending on the producer
    val path1 = Option(q.getPath).getOrElse("")
    val trimmed = if (path1.length > 1 && path1.endsWith("/"))
      path1.dropRight(1) else path1
    s"${q.getScheme}://${Option(q.getAuthority).getOrElse("")}$trimmed"
  }

  private[plans] def measureKey(col: String, castTo: Option[DataType]): String =
    col.toLowerCase + castTo.map(t => "::" + t.sql.toLowerCase).getOrElse("")

  def register(basePath: String, d: MvDef): Unit = {
    // idempotent per view path: re-registering replaces the same
    // view's definition, never stacks duplicates of it
    registry.updateWith(sessionKey(basePath))(old =>
      Some(old.getOrElse(Nil).filterNot(_.viewPath == d.viewPath) :+ d))
    viewPlans.remove(d.viewPath)
  }

  /** Deregister EVERY view of the base (the pre-multi-view contract;
    * programmatic callers that own the whole base keep using it).
    */
  def deregister(basePath: String): Unit =
    registry.remove(sessionKey(basePath)).foreach(_.foreach(d =>
      viewPlans.remove(d.viewPath)))

  /** Deregister one view of the base, leaving siblings armed — the
    * form the SQL DDL layer uses (DROP of one MV must not disarm the
    * base's other rollups).
    */
  def deregister(basePath: String, viewPath: String): Unit = {
    registry.updateWith(sessionKey(basePath)) {
      case None => None
      case Some(ds) =>
        val rest = ds.filterNot(_.viewPath == viewPath)
        if (rest.isEmpty) None else Some(rest)
    }
    viewPlans.remove(viewPath)
  }

  def registered(basePath: String): Option[MvDef] =
    registeredDefs(basePath).headOption

  def registeredDefs(basePath: String): Seq[MvDef] =
    registry.get(sessionKey(basePath)).getOrElse(Nil)

  /** Idempotent live-session registration for sessions built without
    * [[graft.GraftExtensions]] (the builder path injects this rule
    * into the operator-optimization batch; here it lands in the
    * post-hoc user batch — both see the same Aggregate-over-scan
    * shape, and running in both is a no-op second time because a
    * rewritten plan no longer references a registered base path).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** The base scan under an Aggregate, tolerating the pruning Project
    * and a group-column Filter in either order. Returns (relation,
    * filter condition if any).
    */
  private def decompose(plan: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = plan match {
    case lr: LogicalRelation => Some((lr, None))
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(child)
    case Filter(cond, child) =>
      decompose(child).flatMap {
        // one filter layer is enough: optimizer collapses conjunctions
        case (lr, None) => Some((lr, Some(cond)))
        case _ => None
      }
    case _ => None
  }

  /** The registry key a scan matches: a single-root scan matches its
    * root; a MULTI-root scan matches the maintained-table dir all its
    * roots live under — but only when the root set equals the table's
    * CURRENT committed live bucket set exactly (a zone-pruned, bucket-
    * pruned or time-travel scan aggregates a SUBSET, and rewriting it
    * to the full view would be wrong; a dirty merge-on-read table
    * never reaches here — its fold plan is not a bare LogicalRelation).
    * This is what lets `CREATE MATERIALIZED VIEW ... FROM t` rewrite
    * aggregates over the registered table t itself, not just over
    * single-root parquet copies.
    */
  private def pathOf(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
      Some(normalize(fs.location.rootPaths.head.toString))
    case fs: HadoopFsRelation if fs.location.rootPaths.length > 1 =>
      val roots = fs.location.rootPaths.map(p => normalize(p.toString))
      val dirs = roots.map { r =>
        val i = r.lastIndexOf("/data/")
        if (i < 0) "" else r.substring(0, i)
      }.distinct
      dirs match {
        case Seq(d) if d.nonEmpty && registry.contains(sessionKey(d)) =>
          graft.cdc.TxLog.latest(SparkSession.active, d) match {
            case Some(s) if s.deltas.isEmpty &&
                s.buckets.values.map(rel =>
                  normalize(s"$d/data/$rel")).toSet == roots.toSet =>
              Some(normalize(d))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** The freshness fence (round-5 item): with an AggView-backed view
    * whose base is a feed-emitting Compaction table, compare the
    * base's highest PUBLISHED feed batch against the view's last
    * APPLIED batch id — both one driver-side manifest read — and
    * refuse the rewrite while the base is ahead. A stale registered
    * view then silently serves the BASE (correct, slower) instead of
    * stale aggregates; the next `applyFeed` makes the rewrite fire
    * again with no re-registration needed.
    */
  private def isFresh(d: MvDef): Boolean = d.aggView match {
    case None => true // plain Mv.create views: registrar owns freshness
    case Some(link) =>
      val spark = SparkSession.active
      graft.cdc.TxLog.latest(spark, link.viewDir) match {
        case None => false
        case Some(vs) if vs.props.contains("invalid") =>
          // an invalidated min/max view never serves (r13): its state
          // is valid-but-frozen, and the batch fence below would ALSO
          // hold it back — this check makes the refusal independent
          // of feed timing
          false
        case Some(vs) =>
          val applied = vs.props.get("last_batch_id")
            .map(_.toLong).getOrElse(Long.MinValue)
          link.baseTableDir.forall { baseDir =>
            graft.cdc.TxLog.latest(spark, baseDir).exists { bs =>
              bs.counter("next_feed_batch") - 1L <= applied
            }
          }
      }
  }

  private def rewrite(agg: Aggregate): Option[Aggregate] = for {
    (lr, filterCond) <- decompose(agg.child)
    base <- pathOf(lr)
    // several rollups may match (e.g. a (k1) view and a (k1, k2)
    // view both derive a GROUP BY k1): serve the CHEAPEST — fewest
    // partial bytes, resolved from the matching views' file indexes
    // (structurally-unmatched candidates never touch the filesystem)
    result <- registry.get(s"$sessionTag|$base").getOrElse(Nil)
      .flatMap(d => rewriteWith(agg, filterCond, d))
      .minByOption(_._2).map(_._1)
  } yield result

  private def rewriteWith(agg: Aggregate, filterCond: Option[Expression],
      d: MvDef): Option[(Aggregate, Long)] = for {
    // groupings must be bare columns within the view's key set
    groupAttrs <- Some(agg.groupingExpressions).filter(_.forall {
      case a: AttributeReference => d.groupCols.contains(a.name.toLowerCase)
      case _ => false
    }).map(_.map(_.asInstanceOf[AttributeReference]))
    // a filter may only prune whole groups — and must be deterministic:
    // rand() has no references, but per-ROW sampling evaluated per
    // GROUP row on the partial table is a different query
    _ <- Some(()).filter(_ => filterCond.forall(c =>
      c.deterministic && c.references.toSeq.forall(
        r => d.groupCols.contains(r.name.toLowerCase))))
    // the freshness fence LAST among the cheap checks: it is the first
    // that touches the filesystem (one memoized manifest listing per
    // table — see TxLog.latest), so structurally unmatched aggregates
    // never probe
    _ <- Some(()).filter(_ => isFresh(d))
    (view, bytes) <- viewScan(d)
    viewAttr = (n: String) => view.output.find(_.name.equalsIgnoreCase(n))
    cnt <- viewAttr(d.cntCol)
    newAggs <- traverseOpt(agg.aggregateExpressions)(
      rewriteOutput(_, d, viewAttr, cnt))
    newGroups <- traverseOpt(groupAttrs)(a => viewAttr(a.name))
    newCond <- filterCond match {
      case None => Some(None)
      case Some(c) => remapRefs(c, viewAttr).map(Some(_))
    }
  } yield (Aggregate(newGroups, newAggs,
    newCond.map(Filter(_, view)).getOrElse(view)), bytes)

  /** The view's resolved scan plus its total file bytes — the cost
    * the cheapest-view pick orders on (partial-table size is the
    * rollup-work proxy; both come from the same cached file index).
    */
  private def viewScan(d: MvDef): Option[(LogicalPlan, Long)] = {
    val spark = SparkSession.active
    val resolved: Option[(Long, LogicalPlan)] = d.aggView match {
      case None =>
        Some(viewPlans.getOrElseUpdate(d.viewPath,
          (0L, GraftBridge.planOf(spark.read.parquet(d.viewPath)))))
      case Some(link) =>
        // resolve the view's CURRENT committed state through its
        // manifest: generation dirs of stale/crashed merges are
        // invisible, and a refresh (new manifest version) invalidates
        // the cached listing exactly once
        graft.cdc.TxLog.latest(spark, link.viewDir).flatMap { snap =>
          val paths = snap.buckets.values
            .map(rel => s"${link.viewDir}/data/$rel").toSeq
          if (paths.isEmpty) None // fully-retracted view: serve the base
          else Some(viewPlans.get(d.viewPath) match {
            case Some(hit @ (v, _)) if v == snap.version => hit
            case _ =>
              val schema = DataType.fromJson(snap.props("schema_json"))
                .asInstanceOf[org.apache.spark.sql.types.StructType]
              val entry = (snap.version, GraftBridge.planOf(
                spark.read.schema(schema).parquet(paths: _*)))
              viewPlans.put(d.viewPath, entry)
              entry
          })
        }
    }
    resolved.map(_._2) match {
      case Some(lr: LogicalRelation) =>
        val bytes = lr.relation match {
          case fs: HadoopFsRelation => fs.location.sizeInBytes
          case r => r.sizeInBytes
        }
        Some((lr.newInstance(), bytes))
      case _ => None
    }
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }

  /** Rebuild one output expression over the view, PRESERVING its
    * exprId so parents are untouched.
    */
  private def rewriteOutput(ne: NamedExpression, d: MvDef,
      viewAttr: String => Option[Attribute],
      cnt: Attribute): Option[NamedExpression] = ne match {
    case al @ Alias(child, name) =>
      rewriteExpr(child, d, viewAttr, cnt).map(nc =>
        Alias(nc, name)(al.exprId, al.qualifier, al.explicitMetadata))
    case ar: AttributeReference =>
      viewAttr(ar.name).map(va => Alias(va, ar.name)(ar.exprId))
    case _ => None
  }

  private def rewriteExpr(e: Expression, d: MvDef,
      viewAttr: String => Option[Attribute],
      cnt: Attribute): Option[Expression] = e match {
    case ae: AggregateExpression => rewriteAgg(ae, d, viewAttr, cnt)
    case a: AttributeReference => viewAttr(a.name)
    case other =>
      traverseOpt(other.children)(rewriteExpr(_, d, viewAttr, cnt))
        .map(other.withNewChildren)
  }

  private def rewriteAgg(ae: AggregateExpression, d: MvDef,
      viewAttr: String => Option[Attribute],
      cnt: Attribute): Option[Expression] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    def partial(child: Expression, kind: Partials => Option[String])
        : Option[Attribute] =
      (child match {
        case a: AttributeReference => Some(measureKey(a.name, None))
        case c: Cast => c.child match {
          case a: AttributeReference => Some(measureKey(a.name, Some(c.dataType)))
          case _ => None
        }
        case _ => None
      }).flatMap(d.measures.get).flatMap(kind).flatMap(viewAttr)
    val mapped: Option[Expression] = ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null =>
        // count skips nulls, so count(NULL) ≡ 0 and must NOT become
        // the group row count; the non-null literal is the count(*)
        // family. Coalesce: sum over an empty relation is NULL where
        // the global count is 0.
        Some(Coalesce(Seq(
          ae.copy(aggregateFunction = Sum(Cast(cnt, LongType))),
          Literal(0L))))
      // count(m) → Σ per-group non-null counts (r12): the nncnt
      // partial IS count(m) per group, so the rollup is exact for any
      // null pattern; absent partial (pre-r12 view state) bails
      case Count(Seq(c)) => partial(c, _.nncnt).map(p =>
        Coalesce(Seq(
          ae.copy(aggregateFunction = Sum(Cast(p, LongType))),
          Literal(0L))))
      // avg(m) for DECIMAL measures (r12): reconstruct Spark's own
      // Average evaluate path over the stored partials so the result
      // is bit-identical to the base aggregation — Σsum restored to
      // Average's internal sum type decimal(p+10, s), divided by the
      // Σ non-null count cast to decimal(20, 0) under LEGACY eval
      // (divide-by-zero → NULL, avg-of-empty semantics), cast to
      // Average's result type decimal(p+4, s+4). Identical operand
      // types ⇒ identical Divide result type ⇒ identical HALF_UP
      // rounding. Float/double avg bails to the base: sum/count order
      // sensitivity makes a partial rollup inexact there.
      case a: Average => a.child.dataType match {
        case dt: org.apache.spark.sql.types.DecimalType =>
          for {
            sp <- partial(a.child, _.sum)
            np <- partial(a.child, _.nncnt)
          } yield {
            import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode}
            import org.apache.spark.sql.types.DecimalType
            val sumDT =
              DecimalType(math.min(38, dt.precision + 10), dt.scale)
            // TWO aggregates replace the one Average: each needs its
            // OWN resultId — copies sharing ae's id would collide in
            // the aggregation buffer (same slot, different types)
            val sumAgg = ae.copy(aggregateFunction = Sum(sp),
              resultId = NamedExpression.newExprId)
            val cntAgg = ae.copy(aggregateFunction = Sum(Cast(np, LongType)),
              resultId = NamedExpression.newExprId)
            Cast(Divide(Cast(sumAgg, sumDT),
              Cast(cntAgg, DecimalType(20, 0)), EvalMode.LEGACY),
              ae.dataType)
          }
        case _ => None
      }
      case s: Sum => partial(s.child, _.sum).map(p =>
        ae.copy(aggregateFunction = s.copy(child = p)))
      case m: Min => partial(m.child, _.min).map(p =>
        ae.copy(aggregateFunction = m.copy(child = p)))
      case m: Max => partial(m.child, _.max).map(p =>
        ae.copy(aggregateFunction = m.copy(child = p)))
      case _ => None
    }
    // re-aggregating a decimal sum widens again; restore the original
    // result type so parents (and the schema) are unchanged
    mapped.map(ne => if (ne.dataType == ae.dataType) ne
      else Cast(ne, ae.dataType))
  }

  private def remapRefs(e: Expression,
      viewAttr: String => Option[Attribute]): Option[Expression] =
    e match {
      case a: AttributeReference => viewAttr(a.name)
      case other =>
        traverseOpt(other.children)(remapRefs(_, viewAttr))
          .map(other.withNewChildren)
    }
}

/** User surface for creating + registering materialized views. */
object Mv {

  /** One view measure: a base column, optionally pre-cast (declare the
    * SAME cast your queries use — e.g. the decimal the engine's exact-
    * money queries standardize on).
    */
  final case class Measure(col: String, castTo: Option[String] = None)

  /** Compute and write the partial table for `basePath` grouped by
    * `groupCols`, then register it for rewrite. One shuffle, map-side
    * combined; the view is O(|groups|) rows.
    */
  def create(spark: SparkSession, basePath: String, viewPath: String,
      groupCols: Seq[String], measures: Seq[Measure]): Unit = {
    require(groupCols.nonEmpty && measures.nonEmpty)
    // a REFRESH of a still-registered base must not be rewritten onto
    // the stale view it is trying to replace: create's own aggregate
    // matches the rule perfectly, so deregister first
    MvRewrite.deregister(basePath)
    val base = spark.read.parquet(basePath)
    val m = (c: Measure) => c.castTo
      .map(t => col(c.col).cast(t)).getOrElse(col(c.col))
    val aggs = count(lit(1)).cast("long").as("__cnt") +:
      measures.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(m(c)).as(s"__sum_$i"), min(m(c)).as(s"__min_$i"),
          max(m(c)).as(s"__max_$i"),
          count(m(c)).as(s"__nncnt_$i"))
      }
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(viewPath)
    val keys = measures.zipWithIndex.map { case (c, i) =>
      MvRewrite.measureKey(c.col, c.castTo.map(
        org.apache.spark.sql.types.DataType.fromDDL)) ->
        MvRewrite.Partials(sum = Some(s"__sum_$i"),
          min = Some(s"__min_$i"), max = Some(s"__max_$i"),
          nncnt = Some(s"__nncnt_$i"))
    }.toMap
    MvRewrite.register(basePath,
      MvRewrite.MvDef(viewPath, groupCols.map(_.toLowerCase), "__cnt", keys))
  }

  /** Register an [[graft.cdc.AggView]]-maintained view (cnt + decimal
    * sum partials, possibly streaming-maintained by
    * `StreamingAggView`) for transparent rewrite of count/sum
    * aggregates over `basePath` grouped by the view's key. The view
    * stores `sum(value::DECIMAL(18,2))`, so that exact cast is the
    * measure a query must use (the engine's standard exact-money
    * shape); min/max stay on the base — AggView keeps no order
    * statistics.
    *
    * The rule resolves the view's committed state through its manifest
    * on every query, so a refresh is picked up WITHOUT re-registering.
    * Pass `baseTableDir` when the base is the Compaction table whose
    * change feed maintains this view: the rewrite then also checks the
    * feed fence (base's last published batch vs the view's last
    * applied one) and serves the BASE while the view lags — the
    * freshness coupling a bare path registration cannot have.
    */
  def registerAggView(spark: SparkSession, viewDir: String,
      basePath: String, baseTableDir: Option[String] = None): Unit = {
    val (key, valueCol, _, _) = graft.cdc.AggView.readMeta(spark, viewDir)
    // append-only views (r13) also carry vmin/vmax; min/max queries
    // then roll up (max of maxes) like any other partial
    val mm = graft.cdc.AggView.minMaxEnabled(spark, viewDir)
    MvRewrite.register(basePath, MvRewrite.MvDef(
      // composite view keys arrive comma-joined from readMeta
      viewDir, key.split(",").toSeq.filter(_.nonEmpty).map(_.toLowerCase),
      "cnt",
      Map(MvRewrite.measureKey(valueCol,
        Some(org.apache.spark.sql.types.DataType.fromDDL("decimal(18,2)")))
        -> MvRewrite.Partials(sum = Some("total"),
          nncnt = Some("nncnt"),
          min = if (mm) Some("vmin") else None,
          max = if (mm) Some("vmax") else None)),
      aggView = Some(MvRewrite.AggViewLink(viewDir, baseTableDir))))
  }

  def deregister(basePath: String): Unit = MvRewrite.deregister(basePath)

  /** Deregister ONE view of the base (siblings stay armed). */
  def deregister(basePath: String, viewPath: String): Unit =
    MvRewrite.deregister(basePath, viewPath)

  /** The view dirs/paths registered against `basePath` in the ACTIVE
    * session — a base may carry several rollups; DDL layers use this
    * to deregister only their own.
    */
  def registeredViewDirs(basePath: String): Seq[String] =
    MvRewrite.registeredDefs(basePath).map(d =>
      d.aggView.map(_.viewDir).getOrElse(d.viewPath))

  /** True when `df`'s optimized plan reads `viewPath` (and not the
    * base) — the spec's and demos' rewrite probe.
    */
  def readsView(df: DataFrame, viewPath: String): Boolean = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(p => MvRewrite.normalize(p.toString))
        case _ => Nil
      }
    }.flatten
    val v = MvRewrite.normalize(viewPath)
    // manifest-backed views scan explicit bucket paths UNDER the view
    // dir, so prefix-match as well as exact-match
    scans.exists(s => s == v || s.startsWith(v + "/"))
  }
}
