package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Pmod, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.TxLog

/** Transparent bucket pruning for SQL over the maintained merge table
  * ([[graft.cdc.Compaction]]): a user who registers `Compaction.read`
  * as a view and writes plain SQL gets the SAME O(changed-data) scans
  * the programmatic API hands out —
  *
  *  - `WHERE key = k` / `key IN (…)`: only the buckets the literals
  *    hash into are scanned (the [[graft.cdc.Compaction.lookup]]
  *    O(1-bucket) point read, reached from SQL);
  *  - `WHERE version > w` / `>=` / `<` / `<=` / `=` (and BETWEEN,
  *    which analyzes to a >= ∧ <= pair): only buckets whose
  *    manifest-recorded [min, max] version envelope can satisfy the
  *    predicate are scanned (the
  *    [[graft.cdc.Compaction.readChangedSince]] zone-map prune,
  *    reached from SQL, in both directions).
  *
  * The rule recognizes a Filter directly over a parquet relation whose
  * root paths are exactly bucket directories of one committed graft
  * manifest (`<table>/manifest` + `<table>/data/g<V>[-txn]/bucket=B`),
  * computes the surviving bucket set DRIVER-side from the manifest's
  * metadata — the bucket of each key literal evaluated through the
  * same Catalyst `xxhash64` expression the writers partition by
  * ([[graft.cdc.Bucketing]]), so physical-type hashing can never skew
  * — plus a typed zone-map comparison, and swaps in a file index over
  * the surviving directories. The Filter stays on top: pruning only
  * removes directories that provably cannot hold a matching row.
  *
  * Bail-outs keep it sound: any root path not in the CURRENT manifest
  * (stale plan), a relation with partition columns, a non-literal
  * comparand, a literal whose type differs from the column's (a
  * type-promoted comparison wraps the column in a Cast and never
  * reaches here), or any evaluation surprise (the rule body is
  * NonFatal-guarded) leaves the plan untouched. Cost: one driver-side
  * manifest read per (table, committed version) — cached — plus a few
  * KB of bucket metadata even at 4096 buckets.
  */
object MergePruning extends Rule[LogicalPlan] {

  /** One zone-mappable component of a bucket: its base files, or the
    * union of its merge-on-read delta files (min is never recorded for
    * deltas — a missing stat keeps the bucket conservatively).
    */
  private final case class Comp(min: Option[String], max: Option[String])

  private final case class Info(
      tableDir: String, version: Long, keys: Seq[String],
      versionCol: Option[String],
      nBuckets: Int,
      /** every live directory of each bucket: the base dir plus any
        * merge-on-read delta dirs — key pruning keeps or drops them
        * TOGETHER (same hash), which is what keeps the rule sound on
        * the fold plan's base+delta scan leg.
        */
      bucketDirs: Map[Int, Seq[String]],
      comps: Map[Int, Seq[Comp]])

  /** table dir -> cached manifest metadata (re-validated against the
    * latest committed version on every use, so a refresh invalidates
    * on the next query).
    */
  private val cache = TrieMap.empty[String, Info]

  /** Idempotent live-session registration (sessions built through
    * [[graft.GraftExtensions]] get the rule injected instead).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MergePruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MergePruning

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, lr: LogicalRelation) =>
      try prune(f, cond, lr).getOrElse(f)
      catch { case scala.util.control.NonFatal(_) => f }
  }

  private def normalize(p: String): String = MvRewrite.normalize(p)

  // the (table dir, bucket id) iff path is <t>/data/g<V>[-txn]/bucket=N
  private def tableDirOf(path: Path): Option[(String, Int)] = {
    val bucketName = path.getName
    if (!bucketName.startsWith("bucket=")) return None
    val gen = path.getParent
    if (gen == null || !gen.getName.startsWith("g")) return None
    val data = gen.getParent
    if (data == null || data.getName != "data") return None
    val table = data.getParent
    if (table == null) return None
    scala.util.Try(bucketName.drop(7).toInt).toOption
      .map(b => (table.toString, b))
  }

  private def infoFor(spark: SparkSession, tableDir: String): Option[Info] = {
    val latest = TxLog.latestVersion(spark, tableDir).getOrElse(return None)
    cache.get(tableDir).filter(_.version == latest).orElse {
      val snap = TxLog.read(spark, tableDir, latest)
      for {
        key <- snap.prop("key")
        nBuckets <- snap.prop("n_buckets").map(_.toInt)
      } yield {
        // Scd2/Compaction manifests carry a version column (zone maps
        // possible); AggView's don't — key pruning still applies
        val versionCol = snap.prop("version_col")
        val deltas = snap.deltas
        val ids = snap.buckets.keySet ++ deltas.keySet
        val info = Info(tableDir, latest,
          key.split(",").toSeq.filter(_.nonEmpty), versionCol, nBuckets,
          bucketDirs = ids.map { b =>
            b -> (snap.buckets.get(b).toSeq ++ deltas.getOrElse(b, Nil))
              .map(rel => normalize(s"$tableDir/data/$rel"))
          }.toMap,
          comps = ids.map { b =>
            val base = snap.buckets.get(b).map(_ =>
              Comp(snap.prop(s"minv.$b"), snap.prop(s"maxv.$b")))
            val delta = deltas.get(b).map(_ =>
              Comp(None, snap.prop(s"dmaxv.$b")))
            b -> (base.toSeq ++ delta.toSeq)
          }.toMap)
        cache.put(tableDir, info)
        info
      }
    }
  }

  /** Same physical hash the writers bucket by ([[graft.cdc.Bucketing]]:
    * `pmod(xxhash64(keys…), n)`), folded on the literal(s) driver-side.
    */
  private def bucketOf(ls: Seq[Literal], nBuckets: Int): Int =
    Cast(Pmod(new XxHash64(ls), Literal(nBuckets.toLong, LongType)),
      IntegerType).eval().asInstanceOf[Int]

  private def bucketOf(l: Literal, nBuckets: Int): Int =
    bucketOf(Seq(l), nBuckets)

  private def prune(f: Filter, cond: Expression,
      lr: LogicalRelation): Option[LogicalPlan] = {
    val fs = lr.relation match {
      case r: HadoopFsRelation if r.partitionSchema.isEmpty => r
      case _ => return None
    }
    val roots = fs.location.rootPaths
    if (roots.isEmpty) return None
    val parsed = roots.map(tableDirOf)
    if (parsed.exists(_.isEmpty)) return None
    val tableDirs = parsed.flatten.map(_._1).distinct
    if (tableDirs.size != 1) return None
    val spark = fs.sparkSession
    val info = infoFor(spark, tableDirs.head).getOrElse(return None)

    // stale plan (manifest advanced since the scan was built): bail
    val rootSet = roots.map(p => normalize(p.toString)).toSet
    if (!rootSet.subsetOf(info.bucketDirs.values.flatten.toSet)) return None
    val liveHere: Map[Int, Seq[String]] =
      info.bucketDirs.map { case (b, ds) =>
        b -> ds.filter(rootSet.contains)
      }.filter(_._2.nonEmpty)

    // single-column leaf pruning applies only to single-column keys; a
    // composite key needs the FULL tuple bound (see compositeBucket)
    def isKey(a: AttributeReference) =
      info.keys.size == 1 && a.name.equalsIgnoreCase(info.keys.head)
    def isVersion(a: AttributeReference) =
      info.versionCol.exists(a.name.equalsIgnoreCase)

    /** Composite-key point pruning: a conjunction that binds EVERY key
      * column to a same-typed literal pins exactly one bucket — the
      * SQL-transparent form of the tuple lookup. Bindings come from
      * top-level conjuncts only (an OR branch binding the tuple does
      * not constrain the whole filter); conflicting duplicate
      * bindings (k = 1 AND k = 2) pick one arbitrarily, which is
      * sound — the residual filter still applies and matches nothing.
      */
    def compositeBucket(e: Expression): Option[Set[Int]] = {
      if (info.keys.size <= 1) return None
      def conjuncts(x: Expression): Seq[Expression] = x match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case o => Seq(o)
      }
      val bindings: Map[String, Literal] = conjuncts(e).collect {
        case EqualTo(a: AttributeReference, l: Literal)
            if l.value != null && l.dataType == a.dataType =>
          a.name.toLowerCase -> l
        case EqualTo(l: Literal, a: AttributeReference)
            if l.value != null && l.dataType == a.dataType =>
          a.name.toLowerCase -> l
        case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
            a: AttributeReference, l: Literal)
            if l.value != null && l.dataType == a.dataType =>
          a.name.toLowerCase -> l
      }.toMap
      if (info.keys.forall(k => bindings.contains(k.toLowerCase)))
        Some(Set(bucketOf(
          info.keys.map(k => bindings(k.toLowerCase)), info.nBuckets)))
      else None
    }

    /** True iff the stored stringified stat, cast back to the
      * column's type, satisfies `op(stat, lit)` — a missing stat or a
      * null/failed comparison keeps the bucket conservatively.
      */
    def statHolds(stat: Option[String], a: AttributeReference, l: Literal,
        op: (Expression, Expression) => Expression): Boolean =
      stat match {
        case None => true
        case Some(s) =>
          val typed = Cast(
            Literal(UTF8String.fromString(s), StringType), a.dataType,
            Some(SQLConf.get.sessionLocalTimeZone))
          op(typed, l).eval() match {
            case b: Boolean => b
            case _ => true
          }
      }

    /** Buckets with ANY component (base files, or the merge-on-read
      * delta union) whose [min, max] envelope can satisfy the
      * predicate — a bucket with no recorded components is kept
      * conservatively (typed zone-map comparison; see [[statHolds]]).
      */
    def zonePass(keep: Comp => Boolean): Set[Int] =
      liveHere.keySet.filter { b =>
        val cs = info.comps.getOrElse(b, Nil)
        cs.isEmpty || cs.exists(keep)
      }
    def maxHolds(a: AttributeReference, l: Literal,
        op: (Expression, Expression) => Expression)(c: Comp): Boolean =
      statHolds(c.max, a, l, op)
    def minHolds(a: AttributeReference, l: Literal,
        op: (Expression, Expression) => Expression)(c: Comp): Boolean =
      statHolds(c.min, a, l, op)

    // the allowed-bucket set a predicate subtree implies (None = not
    // prunable): AND intersects — a non-prunable conjunct is simply
    // residual, the other side still prunes; OR unions — and is sound
    // ONLY when BOTH branches prune (an unprunable branch could match
    // rows anywhere, so the disjunction must bail)
    def allowed(e: Expression): Option[Set[Int]] = e match {
      case And(x, y) => (allowed(x), allowed(y)) match {
        case (Some(a), Some(b)) => Some(a.intersect(b))
        case (a, b) => a.orElse(b)
      }
      case org.apache.spark.sql.catalyst.expressions.Or(x, y) =>
        for { a <- allowed(x); b <- allowed(y) } yield a.union(b)
      case leaf => leafBuckets(leaf)
    }

    def leafBuckets(e: Expression): Option[Set[Int]] = e match {
        case EqualTo(a: AttributeReference, l: Literal)
            if isKey(a) && l.value != null && l.dataType == a.dataType =>
          Some(Set(bucketOf(l, info.nBuckets)))
        case EqualTo(l: Literal, a: AttributeReference)
            if isKey(a) && l.value != null && l.dataType == a.dataType =>
          Some(Set(bucketOf(l, info.nBuckets)))
        // null-safe equality against a non-null literal ≡ equality
        case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
            a: AttributeReference, l: Literal)
            if isKey(a) && l.value != null && l.dataType == a.dataType =>
          Some(Set(bucketOf(l, info.nBuckets)))
        case In(a: AttributeReference, vs)
            if isKey(a) && vs.nonEmpty && vs.forall {
              case l: Literal => l.value != null && l.dataType == a.dataType
              case _ => false
            } =>
          Some(vs.collect { case l: Literal =>
            bucketOf(l, info.nBuckets) }.toSet)
        case GreaterThan(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(zonePass(maxHolds(a, l, GreaterThan)))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(zonePass(maxHolds(a, l, GreaterThanOrEqual)))
        case LessThan(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(zonePass(minHolds(a, l, LessThan)))
        case LessThanOrEqual(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(zonePass(minHolds(a, l, LessThanOrEqual)))
        case EqualTo(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(zonePass(b =>
            minHolds(a, l, LessThanOrEqual)(b) &&
              maxHolds(a, l, GreaterThanOrEqual)(b)))
        // version IN (…): a bucket survives if ANY literal falls in
        // its [min, max] envelope
        case In(a: AttributeReference, vs)
            if isVersion(a) && vs.nonEmpty && vs.forall {
              case l: Literal => l.value != null && l.dataType == a.dataType
              case _ => false
            } =>
          Some(zonePass(b => vs.exists { case l: Literal =>
            minHolds(a, l, LessThanOrEqual)(b) &&
              maxHolds(a, l, GreaterThanOrEqual)(b)
          }))
        case _ => None
      }

    val allowedBuckets = (compositeBucket(cond), allowed(cond)) match {
      case (Some(c), Some(a)) => c.intersect(a)
      case (Some(c), None) => c
      case (None, Some(a)) => a
      case (None, None) => return None
    }
    val keptDirs = liveHere.view
      .filterKeys(allowedBuckets.contains).values.flatten.toSeq
    if (keptDirs.size == rootSet.size) return None

    val newIndex = new InMemoryFileIndex(spark,
      keptDirs.map(new Path(_)), Map.empty[String, String],
      Some(fs.dataSchema))
    val pruned = lr.copy(relation = fs.copy(location = newIndex)(spark))
    Some(f.copy(child = pruned))
  }
}
