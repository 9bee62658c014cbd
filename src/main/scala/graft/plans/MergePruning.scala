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

import graft.cdc.{Compaction, TxLog}

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
      comps: Map[Int, Seq[Comp]],
      /** clusterBy columns (stored-name spelling) and their per-bucket
        * [cmin, cmax] zone components (r12): base files bounded,
        * merge-on-read deltas unbounded (a dirty bucket always
        * survives a cluster zone pass).
        */
      clusterBy: Seq[String],
      clusterComps: Map[(Int, String), Seq[Comp]],
      /** per-(bucket, column, `_tp` leaf) cluster bounds (r13):
        * `cmin.<b>.<tp>.<col>` keys parsed once per manifest — the
        * finer zone maps the leaf admission prunes `_tp` dirs with on
        * clustered+time-partitioned tables.
        */
      clusterLeaf: Map[(Int, String), Map[Int, Comp]],
      /** per-(bucket, `_tp` leaf) VERSION bounds (r14):
        * `vminl.<b>.<tp>` / `vmaxl.<b>.<tp>` — version-range leaf
        * admission for tables whose version does not track time.
        */
      versionLeaf: Map[Int, Map[Int, Comp]],
      /** time-partition spec (unit, source column), retention floor,
        * and the dirty (merge-on-read) bucket set: `_tp=` leaf
        * admission range-prunes CLEAN buckets only — a fold's input
        * must keep full history (same invariant as the catalog scan's
        * `rangeOk = false`).
        */
      tp: Option[(String, String)], tpMin: Option[Int],
      dirty: Set[Int],
      /** full manifest props (r14): the CBO stats attachment folds
        * rows./cndv./cnul./minv./maxv./cmin./cmax. families from them
        * — kept on the cached Info so the fold costs one manifest
        * decode per (table, version), like everything else here.
        */
      props: Map[String, String])

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
    // CBO-visible manifest stats on the registered-view route (r14):
    // the same rowCount / key-uniqueness NDV / cluster-column HLL NDV
    // the DSv2 catalog scan reports (GraftBatch.estimateStatistics)
    // attach to the parquet relation a registered view serves — join
    // strategy no longer diverges between the two front doors. Runs
    // bottom-up BEFORE the Filter case, so pruned relations keep the
    // attached stats.
    case lr: LogicalRelation =>
      try attachStats(lr).getOrElse(lr)
      catch { case scala.util.control.NonFatal(_) => lr }
    case f @ Filter(cond, lr: LogicalRelation) =>
      try prune(f, cond, lr).getOrElse(f)
      catch { case scala.util.control.NonFatal(_) => f }
  }

  private def normalize(p: String): String = MvRewrite.normalize(p)

  /** One parsed scan root: the table dir, the bucket id, the bucket
    * DIRECTORY (normalized — the manifest-level unit the stale-plan
    * check runs on), and the `_tp` value when the root is a
    * time-partition leaf.
    */
  private final case class Root(tableDir: String, bucket: Int,
      bucketDir: String, tp: Option[Int])

  // parses <t>/data/g<V>[-txn]/bucket=N and the time-partitioned leaf
  // <t>/data/g<V>[-txn]/bucket=N/_tp=M
  private def tableDirOf(path: Path): Option[Root] = {
    val (bucketPath, tp) =
      if (path.getName.startsWith("_tp=")) {
        val v = scala.util.Try(path.getName.drop(4).toInt).toOption
          .getOrElse(return None)
        (Option(path.getParent).getOrElse(return None), Some(v))
      } else (path, None)
    val bucketName = bucketPath.getName
    if (!bucketName.startsWith("bucket=")) return None
    val gen = bucketPath.getParent
    if (gen == null || !gen.getName.startsWith("g")) return None
    val data = gen.getParent
    if (data == null || data.getName != "data") return None
    val table = data.getParent
    if (table == null) return None
    scala.util.Try(bucketName.drop(7).toInt).toOption
      .map(b => Root(table.toString, b, normalize(bucketPath.toString), tp))
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
          }.toMap,
          clusterBy = snap.prop("cluster_by")
            .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
          clusterComps = (for {
            b <- ids.toSeq
            c <- snap.prop("cluster_by")
              .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          } yield {
            val base = snap.buckets.get(b).map(_ =>
              Comp(snap.prop(s"cmin.$b.$c"), snap.prop(s"cmax.$b.$c")))
            val delta = deltas.get(b).map(_ => Comp(None, None))
            (b, c.toLowerCase) -> (base.toSeq ++ delta.toSeq)
          }).toMap,
          clusterLeaf = parseClusterLeaf(snap.props,
            snap.prop("cluster_by")
              .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)),
          versionLeaf = parseVersionLeaf(snap.props),
          tp = for { u <- snap.prop("tp_unit"); c <- snap.prop("tp_col") }
            yield (u, c),
          tpMin = snap.prop("tp_min").map(_.toInt),
          dirty = deltas.keySet,
          props = snap.props)
        cache.put(tableDir, info)
        info
      }
    }
  }

  /** [[infoFor]] validated against THIS plan's scan roots. Version
    * numbers restart on re-init (a DROP+CREATE leaves the manifest at
    * v0 again, with a fresh `g0-<txn>` generation), so a version-equal
    * cache hit can still describe the PREVIOUS incarnation of the
    * table — observed as `sql_cluster_leaf_prune` failing its prune
    * assertion on every in-session re-run. When the cached live-dir
    * set does not cover the relation's bucket roots, drop the entry
    * (and the dir's fabricated-stats entry, reborn tables must not
    * serve the old table's stats) and decode the manifest once more;
    * only a FRESH mismatch is a genuinely stale plan for the callers
    * to bail on.
    */
  private def infoForRoots(spark: SparkSession, tableDir: String,
      bucketRoots: Seq[String]): Option[Info] = {
    def covers(i: Info): Boolean = {
      val live = i.bucketDirs.values.flatten.toSet
      bucketRoots.forall(live.contains)
    }
    infoFor(spark, tableDir) match {
      case Some(i) if !covers(i) =>
        cache.remove(tableDir)
        statsCache.remove(tableDir)
        infoFor(spark, tableDir)
      case o => o
    }
  }

  /** One pass over the manifest props collecting the leaf-keyed
    * cluster bounds `cmin.<b>.<tp>.<col>` / `cmax.<b>.<tp>.<col>`
    * into (bucket, colLower) → tp → [min, max] — indexed at decode,
    * not one scan per lookup. A key whose middle segment is not an
    * integer is the flat (bucket-granular) shape and is skipped here.
    */
  private def parseClusterLeaf(props: Map[String, String],
      clusterBy: Seq[String]): Map[(Int, String), Map[Int, Comp]] = {
    if (clusterBy.isEmpty) return Map.empty
    val colSet = clusterBy.map(_.toLowerCase).toSet
    val acc = scala.collection.mutable.Map
      .empty[(Int, String, Int), (Option[String], Option[String])]
    def parse(k: String, p: String): Option[(Int, Int, String)] = {
      val rest = k.drop(p.length)
      val seg = rest.split("\\.", 3)
      if (seg.length != 3) return None
      for {
        b <- seg(0).toIntOption
        tp <- seg(1).toIntOption
        if colSet.contains(seg(2).toLowerCase)
      } yield (b, tp, seg(2).toLowerCase)
    }
    props.foreach { case (k, v) =>
      if (k.startsWith("cmin."))
        parse(k, "cmin.").foreach { case (b, tp, c) =>
          val cur = acc.getOrElse((b, c, tp), (None, None))
          acc((b, c, tp)) = (Some(v), cur._2)
        }
      else if (k.startsWith("cmax."))
        parse(k, "cmax.").foreach { case (b, tp, c) =>
          val cur = acc.getOrElse((b, c, tp), (None, None))
          acc((b, c, tp)) = (cur._1, Some(v))
        }
    }
    acc.toSeq.groupBy { case ((b, c, _), _) => (b, c) }
      .map { case (k, xs) =>
        k -> xs.map { case ((_, _, tp), (mn, mx)) =>
          tp -> Comp(mn, mx) }.toMap
      }
  }

  /** One pass collecting the leaf-keyed VERSION bounds
    * `vminl.<b>.<tp>` / `vmaxl.<b>.<tp>` into bucket → tp → [min,
    * max] — the r14 twin of [[parseClusterLeaf]].
    */
  private def parseVersionLeaf(
      props: Map[String, String]): Map[Int, Map[Int, Comp]] = {
    val acc = scala.collection.mutable.Map
      .empty[(Int, Int), (Option[String], Option[String])]
    def parse(k: String, p: String): Option[(Int, Int)] = {
      val seg = k.drop(p.length).split("\\.", 2)
      if (seg.length != 2) return None
      for { b <- seg(0).toIntOption; tp <- seg(1).toIntOption }
        yield (b, tp)
    }
    props.foreach { case (k, v) =>
      if (k.startsWith("vminl."))
        parse(k, "vminl.").foreach { key =>
          val cur = acc.getOrElse(key, (None, None))
          acc(key) = (Some(v), cur._2)
        }
      else if (k.startsWith("vmaxl."))
        parse(k, "vmaxl.").foreach { key =>
          val cur = acc.getOrElse(key, (None, None))
          acc(key) = (cur._1, Some(v))
        }
    }
    acc.toSeq.groupBy(_._1._1).map { case (b, xs) =>
      b -> xs.map { case ((_, tp), (mn, mx)) => tp -> Comp(mn, mx) }
        .toMap
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

  /** table dir -> (version, fabricated catalog stats) — None cached
    * when the manifest cannot support exact stats (dirty buckets,
    * missing counts) so the decline costs one fold, not one per
    * query. Keyed by dir (one live entry per table, like the Info
    * cache) so a long session's commits never accumulate entries.
    */
  /** Marks a CatalogTable this rule fabricated purely to carry
    * manifest stats — so downstream prunes can tell it from a real
    * registered table and drop it when the scan shrinks.
    */
  private val FabricatedStatsProp = "graft.fabricated.stats"

  private val statsCache =
    TrieMap.empty[String, (Long, Option[
      org.apache.spark.sql.catalyst.catalog.CatalogStatistics])]

  /** Attach the manifest's statistics to a FULL-table graft parquet
    * relation as a fabricated `CatalogTable.stats` entry — the only
    * channel `LogicalRelation.computeStats` reads column stats from.
    * Mirrors [[graft.catalog.GraftBatch]]'s `estimateStatistics`
    * (keeping the two front doors' CBO view identical): exact
    * rowCount, merge-key NDV = rowCount on single-key tables (keys
    * are unique by construction), cluster-column NDV from the merged
    * per-bucket HLL registers + exact null tallies + typed min/max
    * bounds, version-column min/max from the zone maps.
    *
    * Sound-by-decline: only FULL scans of a clean (no merge-on-read)
    * current manifest attach — a subset scan or a dirty bucket would
    * make the manifest fold over- or under-state. Flat layouts prove
    * fullness by bucket-dir identity; time-partitioned layouts (r15)
    * by per-bucket leaf identity against the manifest's version-leaf
    * enumeration. Gated on CBO/planStats being enabled so sessions
    * that never read plan stats pay nothing.
    */
  private def attachStats(lr: LogicalRelation): Option[LogicalPlan] = {
    if (lr.catalogTable.isDefined) return None
    val conf = SQLConf.get
    if (!conf.cboEnabled && !conf.planStatsEnabled) return None
    val fs = lr.relation match {
      case r: HadoopFsRelation if r.partitionSchema.isEmpty => r
      case _ => return None
    }
    val rootPaths = fs.location.rootPaths
    if (rootPaths.isEmpty) return None
    val parsed0 = rootPaths.map(tableDirOf)
    if (parsed0.exists(_.isEmpty)) return None
    val parsed = rootPaths.zip(parsed0.flatten)
    val tableDirs = parsed.map(_._2.tableDir).distinct
    if (tableDirs.size != 1) return None
    val spark = fs.sparkSession
    val info = infoForRoots(spark, tableDirs.head,
      parsed.map(_._2.bucketDir)).getOrElse(return None)
    val liveDirSet = info.bucketDirs.values.flatten.toSet
    info.tp match {
      case None =>
        // full CURRENT flat scan only: every live dir present, no
        // extras
        if (parsed.exists(_._2.tp.isDefined)) return None
        if (parsed.map(_._2.bucketDir).toSet != liveDirSet) return None
      case Some(_) =>
        // time-partitioned layout (r15, was a blanket decline): the
        // scan roots are `_tp=` LEAF dirs, so "full current scan" is
        // proven per bucket — every live bucket present, and its root
        // leaves exactly the leaves the manifest's version-leaf map
        // enumerates (recorded by every current writer from the same
        // footer pass as the row counts, so the enumeration and the
        // stats describe the same files). A bucket with no leaf map —
        // pre-r14 layout (backfill via maintain(refreshStats=true)) or
        // the budget-degraded marker — cannot prove coverage: decline.
        if (info.dirty.nonEmpty) return None
        if (!parsed.forall(_._2.tp.isDefined)) return None
        val rootLeaves: Map[String, Set[Int]] = parsed
          .groupBy(_._2.bucketDir)
          .map { case (d, rs) => d -> rs.flatMap(_._2.tp).toSet }
        if (rootLeaves.keySet != liveDirSet) return None
        val dirOfBucket = info.bucketDirs.map {
          case (b, dirs) => b -> dirs.head }
        val covered = info.bucketDirs.keySet.forall { b =>
          !info.props.contains(s"lvdeg.$b") &&
            info.versionLeaf.get(b).exists { leaves =>
              val live = leaves.keySet
                .filter(tp => info.tpMin.forall(tp >= _))
              live.nonEmpty && rootLeaves.get(dirOfBucket(b))
                .contains(live)
            }
        }
        if (!covered) return None
    }
    val cs = statsCache.get(info.tableDir)
      .collect { case (v, s) if v == info.version => s }
      .getOrElse {
        val built = buildCatalogStats(info, fs.dataSchema,
          math.max(fs.sizeInBytes, 1L))
        statsCache.put(info.tableDir, (info.version, built))
        built
      }
    cs.map { s =>
      lr.copy(catalogTable = Some(
        org.apache.spark.sql.catalyst.catalog.CatalogTable(
          identifier = org.apache.spark.sql.catalyst.TableIdentifier(
            new Path(info.tableDir).getName),
          tableType =
            org.apache.spark.sql.catalyst.catalog.CatalogTableType
              .EXTERNAL,
          storage = org.apache.spark.sql.catalyst.catalog
            .CatalogStorageFormat.empty,
          schema = fs.dataSchema,
          provider = Some("parquet"),
          properties = Map(FabricatedStatsProp -> "true"),
          stats = Some(s))))
    }
  }

  private def buildCatalogStats(info: Info,
      schema: org.apache.spark.sql.types.StructType,
      sizeInBytes: Long): Option[
      org.apache.spark.sql.catalyst.catalog.CatalogStatistics] = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    if (info.dirty.nonEmpty) return None // fold outcome ≠ manifest
    val live = info.bucketDirs.keySet.toSeq
    val counts = live.map(b => info.props.get(s"rows.$b").map(_.toLong))
    if (counts.exists(_.isEmpty)) return None
    val rows = counts.flatten.sum
    // exact schema-case spelling: plan attribute names come from the
    // parquet schema, CatalogStatistics.toPlanStats matches by name
    def fieldOf(c: String) =
      schema.fields.find(_.name.equalsIgnoreCase(c))
    // min/max only for types whose CatalogColumnStat external-string
    // form IS the plain literal rendering the manifest stores
    // (timestamps need the formatter's shape, strings are truncated
    // bounds — both decline)
    def boundable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType => true
        case _: org.apache.spark.sql.types.DecimalType => true
        case _ => false
      }
    def foldBounds(minKey: Int => String, maxKey: Int => String,
        dt: org.apache.spark.sql.types.DataType)
        : (Option[String], Option[String]) = {
      if (!boundable(dt) || live.isEmpty) return (None, None)
      val mins = live.map(b => info.props.get(minKey(b)))
      val maxs = live.map(b => info.props.get(maxKey(b)))
      if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty))
        return (None, None)
      val ord = org.apache.spark.sql.catalyst.types.PhysicalDataType
        .ordering(dt).asInstanceOf[Ordering[Any]]
      def typed(s: String): Option[Any] = {
        val c = Cast(Literal(UTF8String.fromString(s), StringType), dt,
          Some(SQLConf.get.sessionLocalTimeZone))
        if (!c.resolved) None else Option(c.eval())
      }
      val lo = mins.flatten.flatMap(typed(_))
      val hi = maxs.flatten.flatMap(typed(_))
      if (lo.size != live.size || hi.size != live.size) (None, None)
      else (Some(lo.min(ord).toString), Some(hi.max(ord).toString))
    }
    val colStats =
      scala.collection.mutable.Map.empty[String, CatalogColumnStat]
    // merge keys are unique by construction (single-key tables only:
    // composite-tuple uniqueness says nothing about each column)
    if (info.keys.size == 1)
      fieldOf(info.keys.head).foreach { f =>
        colStats(f.name) = CatalogColumnStat(
          distinctCount = Some(BigInt(rows)),
          nullCount = Some(BigInt(0)))
      }
    info.versionCol.flatMap(fieldOf).foreach { f =>
      val (mn, mx) =
        foldBounds(b => s"minv.$b", b => s"maxv.$b", f.dataType)
      if (mn.isDefined)
        colStats(f.name) = CatalogColumnStat(min = mn, max = mx)
    }
    info.clusterBy.flatMap(fieldOf(_)).foreach { f =>
      val c = f.name
      val (mn, mx) = foldBounds(b => s"cmin.$b.$c", b => s"cmax.$b.$c",
        f.dataType)
      // register-wise max across buckets = the merged sketch (same
      // fold as the catalog scan); all-or-nothing per column
      val regs = live.map(b => info.props.get(s"cndv.$b.$c"))
      val ndv: Option[BigInt] =
        if (live.isEmpty || regs.exists(_.isEmpty)) None
        else {
          val decoded = regs.flatten.map(Compaction.decodeRegisters)
          val m = decoded.map(_.length).min
          if (m == 0) None
          else {
            val merged = Array.tabulate(m)(i => decoded.map(_(i)).max)
            val est = graft.operators.DetSketch.hllEstimate(
              merged.zipWithIndex.collect {
                case (r, i) if r > 0L => (i.toLong, r) }.toSeq,
              p = Integer.numberOfTrailingZeros(m))
            Some(BigInt(math.max(1L, math.round(est))))
          }
        }
      val nulls = live.map(b => info.props.get(s"cnul.$b.$c"))
      val nullCount: Option[BigInt] =
        if (live.isEmpty || nulls.exists(_.isEmpty)) None
        else Some(BigInt(nulls.flatten.map(_.toLong).sum))
      if (ndv.isDefined || mn.isDefined || nullCount.isDefined)
        colStats(c) = CatalogColumnStat(distinctCount = ndv,
          min = mn, max = mx, nullCount = nullCount)
    }
    Some(CatalogStatistics(BigInt(sizeInBytes), Some(BigInt(rows)),
      colStats.toMap))
  }

  private def prune(f: Filter, cond: Expression,
      lr: LogicalRelation): Option[LogicalPlan] = {
    val fs = lr.relation match {
      case r: HadoopFsRelation if r.partitionSchema.isEmpty => r
      case _ => return None
    }
    val rootPaths = fs.location.rootPaths
    if (rootPaths.isEmpty) return None
    val parsed0 = rootPaths.map(tableDirOf)
    if (parsed0.exists(_.isEmpty)) return None
    val parsed: Seq[(Path, Root)] = rootPaths.zip(parsed0.flatten)
    val tableDirs = parsed.map(_._2.tableDir).distinct
    if (tableDirs.size != 1) return None
    val spark = fs.sparkSession
    val info = infoForRoots(spark, tableDirs.head,
      parsed.map(_._2.bucketDir)).getOrElse(return None)

    // stale plan (manifest advanced since the scan was built): bail.
    // The check runs at the BUCKET-directory level — a time-partitioned
    // table's scan roots are `bucket=N/_tp=M` leaves, whose parent is
    // the manifest-level unit. One flattened Set: this runs on the
    // optimizer hot path over up to buckets×partitions roots.
    val liveDirSet = info.bucketDirs.values.flatten.toSet
    if (!parsed.forall(p => liveDirSet.contains(p._2.bucketDir)))
      return None
    // layout agreement: a time-partitioned manifest serves leaf roots,
    // a flat one serves bucket roots — any mismatch is a stale plan
    // (e.g. a partition-spec evolution committed after the view built)
    if (parsed.exists(_._2.tp.isDefined != info.tp.isDefined)) return None
    val liveHere: Map[Int, Seq[(Path, Root)]] = parsed.groupBy(_._2.bucket)

    // single-column leaf pruning applies only to single-column keys; a
    // composite key needs the FULL tuple bound (see compositeBucket)
    def isKey(a: AttributeReference) =
      info.keys.size == 1 && a.name.equalsIgnoreCase(info.keys.head)
    def isVersion(a: AttributeReference) =
      info.versionCol.exists(a.name.equalsIgnoreCase)
    def isCluster(a: AttributeReference) =
      info.clusterBy.exists(a.name.equalsIgnoreCase)

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
    /** Cluster-column zone pass (r12): same conservative envelope
      * test over the per-(bucket, column) cmin/cmax components —
      * dirty buckets carry an unbounded delta component and always
      * survive.
      */
    def clusterZonePass(a: AttributeReference)(
        keep: Comp => Boolean): Set[Int] =
      liveHere.keySet.filter { b =>
        val cs = info.clusterComps
          .getOrElse((b, a.name.toLowerCase), Nil)
        cs.isEmpty || cs.exists(keep)
      }

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
        // clusterBy columns (r12): the range predicates clustering
        // lays data out for prune on the per-bucket cmin/cmax zone
        // maps — the registered-name twin of the catalog scan's
        // GraftPrune cluster pass
        case GreaterThan(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some(clusterZonePass(a)(maxHolds(a, l, GreaterThan)))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some(clusterZonePass(a)(maxHolds(a, l, GreaterThanOrEqual)))
        case LessThan(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some(clusterZonePass(a)(minHolds(a, l, LessThan)))
        case LessThanOrEqual(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some(clusterZonePass(a)(minHolds(a, l, LessThanOrEqual)))
        case EqualTo(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some(clusterZonePass(a)(c =>
            minHolds(a, l, LessThanOrEqual)(c) &&
              maxHolds(a, l, GreaterThanOrEqual)(c)))
        case In(a: AttributeReference, vs)
            if isCluster(a) && vs.nonEmpty && vs.forall {
              case l: Literal => l.value != null && l.dataType == a.dataType
              case _ => false
            } =>
          Some(clusterZonePass(a)(c => vs.exists { case l: Literal =>
            minHolds(a, l, LessThanOrEqual)(c) &&
              maxHolds(a, l, GreaterThanOrEqual)(c)
          }))
        case _ => None
      }

    // `_tp` leaf admission (time-partitioned tables): the partition
    // bounds the filter implies for the partition source column, as a
    // union of intervals — the SQL-transparent twin of the catalog
    // scan's pushed-filter pruning. Range admission applies to CLEAN
    // buckets only: a dirty bucket's fold decides winners over full
    // history, so only the retention floor may drop its leaves (the
    // same `rangeOk = false` invariant as GraftBatch / foldBuckets).
    val tpIvs: Seq[(Int, Int)] = info.tp match {
      case None => Compaction.TpAll
      case Some((u, c)) => tpBoundsOf(cond, u, c)
    }
    def tpAdmit(r: Root): Boolean = r.tp match {
      case None => true
      case Some(n) =>
        info.tpMin.forall(n >= _) &&
          (info.dirty.contains(r.bucket) ||
            Compaction.tpAdmits(tpIvs, n))
    }

    // cluster-LEAF admission (r13): top-level cluster-column
    // conjuncts tested against the per-(bucket, `_tp` leaf) bounds —
    // every conjunct must hold for any matching row, so a leaf whose
    // recorded [cmin, cmax] refutes one cannot hold a match; missing
    // bounds admit. CLEAN buckets only (a dirty bucket's fold needs
    // full history — same invariant as the range admission above).
    val clusterLeafTests: Seq[(AttributeReference, Comp => Boolean)] = {
      def conjuncts(x: Expression): Seq[Expression] = x match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case o => Seq(o)
      }
      if (info.clusterBy.isEmpty || info.tp.isEmpty) Nil
      else conjuncts(cond).flatMap {
        case GreaterThan(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some((a, maxHolds(a, l, GreaterThan) _))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some((a, maxHolds(a, l, GreaterThanOrEqual) _))
        case LessThan(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some((a, minHolds(a, l, LessThan) _))
        case LessThanOrEqual(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some((a, minHolds(a, l, LessThanOrEqual) _))
        case EqualTo(a: AttributeReference, l: Literal)
            if isCluster(a) && l.value != null && l.dataType == a.dataType =>
          Some((a, (c: Comp) => minHolds(a, l, LessThanOrEqual)(c) &&
            maxHolds(a, l, GreaterThanOrEqual)(c)))
        case _ => None
      }
    }
    def clusterLeafAdmit(r: Root): Boolean = r.tp match {
      case Some(n) if clusterLeafTests.nonEmpty &&
          !info.dirty.contains(r.bucket) =>
        clusterLeafTests.forall { case (a, test) =>
          info.clusterLeaf.get((r.bucket, a.name.toLowerCase))
            .flatMap(_.get(n)) match {
            case Some(comp) => test(comp)
            case None => true
          }
        }
      case _ => true
    }

    // VERSION leaf admission (r14): top-level version-column conjuncts
    // tested against the per-(bucket, `_tp` leaf) vminl/vmaxl bounds —
    // the version-range twin of the cluster leaf pass, same clean-
    // buckets-only invariant, missing bounds admit.
    val versionLeafTests: Seq[Comp => Boolean] = {
      def conjuncts(x: Expression): Seq[Expression] = x match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case o => Seq(o)
      }
      if (info.tp.isEmpty || info.versionCol.isEmpty) Nil
      else conjuncts(cond).flatMap {
        case GreaterThan(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(maxHolds(a, l, GreaterThan) _)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(maxHolds(a, l, GreaterThanOrEqual) _)
        case LessThan(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(minHolds(a, l, LessThan) _)
        case LessThanOrEqual(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some(minHolds(a, l, LessThanOrEqual) _)
        case EqualTo(a: AttributeReference, l: Literal)
            if isVersion(a) && l.value != null && l.dataType == a.dataType =>
          Some((c: Comp) => minHolds(a, l, LessThanOrEqual)(c) &&
            maxHolds(a, l, GreaterThanOrEqual)(c))
        case _ => None
      }
    }
    def versionLeafAdmit(r: Root): Boolean = r.tp match {
      case Some(n) if versionLeafTests.nonEmpty &&
          !info.dirty.contains(r.bucket) =>
        info.versionLeaf.get(r.bucket).flatMap(_.get(n)) match {
          case Some(comp) => versionLeafTests.forall(_(comp))
          case None => true
        }
      case _ => true
    }

    val allowedBuckets = (compositeBucket(cond), allowed(cond)) match {
      case (Some(c), Some(a)) => c.intersect(a)
      case (Some(c), None) => c
      case (None, Some(a)) => a
      case (None, None) =>
        // no key/version pruning — `_tp` bounds alone may still prune
        // (e.g. a bare `WHERE ts BETWEEN a AND b` over a partitioned
        // table); with neither, leave the plan untouched
        if (tpIvs == Compaction.TpAll) return None
        liveHere.keySet
    }
    val keptDirs = parsed.collect {
      case (path, r) if allowedBuckets.contains(r.bucket) &&
        tpAdmit(r) && clusterLeafAdmit(r) && versionLeafAdmit(r) => path
    }
    if (keptDirs.size == parsed.size) return None

    val newIndex = new InMemoryFileIndex(spark,
      keptDirs, Map.empty[String, String],
      Some(fs.dataSchema))
    // a fabricated full-table stats attach (attachStats) must not ride
    // the pruned copy: a 1-of-N-buckets scan reporting whole-table
    // rowCount/NDV would overstate cardinality to CBO and block a
    // broadcast the actual pruned scan merits. Dropping it falls back
    // to the pruned file index's own sizeInBytes — accurate for what
    // the scan now reads. Real (user-registered) catalog tables are
    // left alone.
    val prunedCatalogTable = lr.catalogTable
      .filterNot(_.properties.contains(FabricatedStatsProp))
    val pruned = lr.copy(relation = fs.copy(location = newIndex)(spark),
      catalogTable = prunedCatalogTable)
    Some(f.copy(child = pruned))
  }

  /** `_tp` interval bounds a Catalyst predicate implies for the
    * partition source column — the expression twin of the catalog
    * scan's pushed-filter walk ([[graft.catalog.GraftBatch]]): AND
    * intersects, OR unions, IN is a union of points, both literal
    * orders accepted; anything the walk cannot type lands on the
    * all-covering interval (conservative both ways).
    */
  private def tpBoundsOf(cond: Expression, unit: String,
      tpCol: String): Seq[(Int, Int)] = {
    val All = Compaction.TpAll
    def isTp(a: AttributeReference) = a.name.equalsIgnoreCase(tpCol)
    def tpOf(l: Literal): Option[Int] =
      if (l.value == null) None
      else scala.util.Try(Compaction.tpValueOf(unit,
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(l.value, l.dataType))).toOption
    // partition granularity is coarser than values, so every bound is
    // INCLUSIVE of its boundary partition (a > v keeps partition tp(v))
    def ge(l: Literal) =
      tpOf(l).map(d => Seq((d, Int.MaxValue))).getOrElse(All)
    def le(l: Literal) =
      tpOf(l).map(d => Seq((Int.MinValue, d))).getOrElse(All)
    // strict <: a bound exactly ON a partition boundary excludes the
    // boundary partition (Compaction.tpStrictUpper) — the shape every
    // rewritten day-cast predicate ends in (`ts < midnight(d+1)`)
    def lt(l: Literal) =
      (if (l.value == null) None
       else scala.util.Try(Compaction.tpStrictUpper(unit,
         org.apache.spark.sql.catalyst.CatalystTypeConverters
           .convertToScala(l.value, l.dataType))).toOption)
        .map(d => Seq((Int.MinValue, d))).getOrElse(All)
    def eq(l: Literal) = tpOf(l).map(d => Seq((d, d))).getOrElse(All)
    def walk(e: Expression): Seq[(Int, Int)] = e match {
      case And(x, y) => Compaction.tpIntersect(walk(x), walk(y))
      case org.apache.spark.sql.catalyst.expressions.Or(x, y) =>
        Compaction.tpUnion(walk(x), walk(y))
      case GreaterThan(a: AttributeReference, l: Literal)
        if isTp(a) => ge(l)
      case GreaterThan(l: Literal, a: AttributeReference)
        if isTp(a) => lt(l)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
        if isTp(a) => ge(l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
        if isTp(a) => le(l)
      case LessThan(a: AttributeReference, l: Literal)
        if isTp(a) => lt(l)
      case LessThan(l: Literal, a: AttributeReference)
        if isTp(a) => ge(l)
      case LessThanOrEqual(a: AttributeReference, l: Literal)
        if isTp(a) => le(l)
      case LessThanOrEqual(l: Literal, a: AttributeReference)
        if isTp(a) => ge(l)
      case EqualTo(a: AttributeReference, l: Literal) if isTp(a) => eq(l)
      case EqualTo(l: Literal, a: AttributeReference) if isTp(a) => eq(l)
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          a: AttributeReference, l: Literal)
        if isTp(a) && l.value != null => eq(l)
      case In(a: AttributeReference, vs)
          if isTp(a) && vs.forall(_.isInstanceOf[Literal]) =>
        // a NULL comparand matches no row — skipping it is sound
        vs.collect { case l: Literal if l.value != null => eq(l) }
          .foldLeft(Seq.empty[(Int, Int)])(Compaction.tpUnion)
      case _ => All
    }
    walk(cond)
  }
}
