package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{AnalysisException, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, expr, lit, when}

import graft.cdc.{Compaction, TxLog}

/** SQL front door for the maintained merge table ([[Compaction]]):
  * register a table under a name and plain SQL both READS it
  * (`spark.table(name)` / `SELECT … FROM name`, served by a temp view
  * over the live manifest with [[MergePruning]] bucket/zone pruning)
  * and MAINTAINS it —
  *
  * {{{
  *   MERGE INTO users USING changes ON users.id = changes.id
  *   WHEN MATCHED AND changes.deleted THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *;
  *   UPDATE users SET name = 'x' WHERE id = 7;
  *   DELETE FROM users WHERE id = 9;
  * }}}
  *
  * — each lowered onto ONE [[Compaction.merge]] batch (path-pruned,
  * manifest-committed, OCC-fenced: everything the programmatic API
  * guarantees, reached from a SQL string). The reference's whole write
  * path is SQL through an ORM
  * (`/root/reference/app/seed_users.py:39-43`); this is its
  * maintained-table analog for SQL-only users.
  *
  * Two entry points share one lowering:
  *  - sessions built with [[graft.GraftExtensions]]: the [[GraftDml]]
  *    resolution rule intercepts `MergeIntoTable` / `UpdateTable` /
  *    `DeleteFromTable` over registered names inside `spark.sql(...)`
  *    itself (before Spark's v2 rewrite rejects the non-catalog
  *    target);
  *  - any live session: [[GraftTables.sql]] parses, lowers the same
  *    way, and delegates everything else to `spark.sql`.
  *
  * Supported MERGE shape (validated, clear errors otherwise): ON must
  * equate every merge-key column; WHEN clauses drawn from
  * `MATCHED [AND c] THEN DELETE`, `MATCHED THEN UPDATE SET *`,
  * `NOT MATCHED THEN INSERT *`. UPDATE/DELETE synthesize a changelog
  * from the CURRENT rows at the stored version — the merge's
  * change-beats-stored tie-break applies them without inventing
  * versions.
  */
object GraftTables {

  /** (session, lowercase name) -> table dir. Session-scoped on
    * purpose (same isolation rule as MvRewrite's registry).
    */
  private val registry = TrieMap.empty[(SparkSession, String), String]

  def register(spark: SparkSession, name: String, dir: String): Unit = {
    registry.put((spark, name.toLowerCase), dir)
    refresh(spark, name)
  }

  def unregister(spark: SparkSession, name: String): Unit = {
    registry.remove((spark, name.toLowerCase))
    spark.catalog.dropTempView(name)
  }

  private[plans] def dirOf(spark: SparkSession, name: String): Option[String] =
    registry.get((spark, name.toLowerCase))

  /** Re-point the temp view at the table's CURRENT manifest. DML
    * through this front door refreshes automatically; after a
    * programmatic `Compaction.merge` call refresh explicitly (the same
    * contract as Spark's own REFRESH TABLE after external writes).
    */
  def refresh(spark: SparkSession, name: String): Unit =
    dirOf(spark, name).foreach { dir =>
      Compaction.read(spark, dir).createOrReplaceTempView(name)
    }

  /** Parse + lower DML over registered tables; anything else delegates
    * to `spark.sql`. The live-session path for sessions built without
    * [[graft.GraftExtensions]]. Also accepts the two maintenance
    * statements Spark's parser does not know (the table-format idiom):
    *
    * {{{
    *   VACUUM t [RETAIN <n> HOURS]   -- age-based history retention
    *   OPTIMIZE t [MIN DELTAS <n>]   -- fold merge-on-read delta chains
    *   DESCRIBE HISTORY t            -- commit audit log
    * }}}
    *
    * `t` is a registered name or a catalog identifier
    * (`graft.ns.t`). Both return a one-row result frame.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftVerbs.parse(sqlText)
      .flatMap(runVerb(spark, _))
      .getOrElse {
        val parsed = spark.sessionState.sqlParser.parsePlan(sqlText)
        GraftDml.lower(spark, parsed) match {
          case Some(cmd) => cmd.run(spark); spark.emptyDataFrame
          case None => spark.sql(sqlText)
        }
      }

  /** Execute one parsed [[GraftVerbs.Verb]]. None = the statement's
    * target is not one of our maintained tables — delegate to
    * `spark.sql` untouched (another extension, e.g. a different table
    * format, may own it). MV verbs always answer (their targets are
    * our own registries and fail loudly when unknown).
    */
  private def runVerb(spark: SparkSession,
      verb: GraftVerbs.Verb): Option[DataFrame] = {
    import GraftVerbs._
    import spark.implicits._
    def dirFor(name: String): Option[String] =
      GraftDml.resolveName(spark, GraftDml.splitIdentifier(name)).map(_.dir)
    verb match {
      case Vacuum(name, hours) =>
        dirFor(name).map { dir =>
          val age = java.time.Duration.ofHours(hours.getOrElse(168L))
          val (_, vacuumed) = Compaction.maintain(spark, dir,
            maxDeltasPerBucket = Int.MaxValue, maxHistoryAge = age)
          Seq((name, vacuumed)).toDF("table", "versions_vacuumed")
        }
      case Optimize(name, minDeltas) =>
        dirFor(name).map { dir =>
          val (folded, _) = Compaction.maintain(spark, dir,
            maxDeltasPerBucket = minDeltas.getOrElse(1))
          Seq((name, folded)).toDF("table", "buckets_folded")
        }
      case DescribeHistory(name) =>
        dirFor(name).map(dir => Compaction.history(spark, dir)
          .orderBy(org.apache.spark.sql.functions.col("version").desc))
      // time-partitioned retention: drop every partition strictly
      // below the bound's partition, metadata-first
      // (Compaction.dropPartitionsBefore)
      case RetirePartitions(name, ts) =>
        dirFor(name).map { dir =>
          // the raw string: tpValueOf parses it in the SESSION zone,
          // like every other bound (Timestamp.valueOf here would
          // shift the destructive cut by the JVM default-TZ offset)
          val n = Compaction.dropPartitionsBefore(spark, dir, ts)
          Seq((name, n)).toDF("table", "partitions_retired")
        }
      // partition-spec evolution: one committed full rewrite into the
      // new layout (Compaction.repartitionTime)
      case SetPartitionSpec(name, unit, colName) =>
        dirFor(name).map { dir =>
          Compaction.repartitionTime(spark, dir, Some(unit -> colName))
          GraftTables.refresh(spark, name)
          Seq((name, s"$unit($colName)"))
            .toDF("table", "partition_spec")
        }
      case DropPartitionSpec(name) =>
        dirFor(name).map { dir =>
          Compaction.repartitionTime(spark, dir, None)
          GraftTables.refresh(spark, name)
          Seq((name, "none")).toDF("table", "partition_spec")
        }
      // SCD2 history retention (Scd2.expireHistoryBefore): resolved
      // OUTSIDE dirFor — resolveName deliberately refuses scd2 tables
      // for merge-semantics DML, but this verb's target must BE one
      case ExpireHistory(name, bound0) =>
        scd2DirFor(spark, name).map { dir =>
          val bound: Any = bound0.fold(identity, identity)
          val dropped = graft.cdc.Scd2.expireHistoryBefore(
            spark, dir, bound)
          Seq((name, dropped)).toDF("table", "rows_expired")
        }
      // write-side time travel: ONE metadata-only commit re-pointing
      // the table at version n's manifest entries (Compaction.restore
      // owns the floor fences and the feed-epoch semantics); any
      // maintained table type. TO TIMESTAMP resolves through the same
      // commit-time lookup TIMESTAMP AS OF reads use (session zone).
      case RestoreTable(name, bound) =>
        anyDirFor(spark, name).map { dir =>
          val version = bound match {
            case Right(v) => v
            case Left(ts) =>
              // parse through Catalyst in the SESSION zone — the same
              // contract every other raw-timestamp verb bound carries
              import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
              val micros = Cast(
                Literal(org.apache.spark.unsafe.types.UTF8String
                  .fromString(ts),
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.TimestampType,
                Some(spark.sessionState.conf.sessionLocalTimeZone))
                .eval() match {
                  case m: java.lang.Long => m.longValue()
                  case _ => GraftDml.fail(
                    s"cannot parse TIMESTAMP '$ts'")
                }
              Compaction.versionAsOfTimestamp(spark, dir, micros / 1000L)
          }
          val newV = Compaction.restore(spark, dir, version)
          GraftTables.refresh(spark, name)
          Seq((name, version, newV))
            .toDF("table", "restored_to", "new_version")
        }
      // inspection verbs for REGISTERED-name users — the SQL twins of
      // the catalog metadata tables (t.files / t.partitions /
      // t.changes, catalog/MetaTables.scala); any maintained type
      case ShowFiles(name) =>
        anyDirFor(spark, name).map { dir =>
          graft.catalog.MetaTables.fileEntries(spark, dir)
            .map { case (b, k, tp, st) =>
              (b, k, tp, st.getPath.toString, st.getLen,
                new java.sql.Timestamp(st.getModificationTime))
            }.toDF("bucket", "kind", "partition", "path",
              "size_bytes", "modified_at")
        }
      case ShowPartitions(name) =>
        anyDirFor(spark, name).map { dir =>
          graft.catalog.MetaTables.partitionEntries(spark, dir)
            .map { case (tp, unit, files, bytes, buckets) =>
              (tp, new java.sql.Timestamp(
                graft.catalog.MetaTables.tpStartMicros(unit, tp) / 1000L),
                unit, files, bytes, buckets)
            }.toDF("partition", "starts_at", "unit", "files",
              "size_bytes", "buckets")
        }
      // batch-range changes read by NAME: readFeed's `batch` is a
      // partition column, so the range filter prunes batch DIRS at
      // plan time — the registered-name twin of t.changes, with the
      // SAME fences
      case ShowChanges(name, fromB, toB) =>
        anyDirFor(spark, name).map { dir =>
          if (!Compaction.feedEnabled(spark, dir))
            GraftDml.fail(s"$name has no change data feed: enable it with " +
              "TBLPROPERTIES ('feed'='true') / feed = true")
          val head = TxLog.latest(spark, dir)
            .map(_.counter("next_feed_batch") - 1L).getOrElse(-1L)
          val hiB = math.min(toB.getOrElse(head), head)
          // retention fence: batches below the recorded horizon are
          // gone — reading past them silently omits their changes
          val (hz, minDir) = Compaction.feedFloor(spark, dir)
          val minAvail = if (hz > 0L) hz
            else minDir.getOrElse(if (head >= fromB) head + 1L else fromB)
          if (fromB < minAvail && fromB <= hiB)
            GraftDml.fail(s"feed batches $fromB..${minAvail - 1} of " +
              s"$name were removed by retention — start the read at " +
              s"FROM $minAvail, or re-seed from a table snapshot")
          // committed-but-unpublished batch inside the range (crashed
          // publish). The catalog t.changes route's rule, verbatim
          // (r11 advice — the two routes must share the SAME fence):
          // an EXPLICIT TO reaching past the gap fails loudly (the
          // caller named batches this read cannot serve); the
          // unbounded form serves the contiguous published prefix —
          // the gap caps the read instead of a middle batch silently
          // vanishing from it
          val published = graft.cdc.Replicator.publishedThrough(
            spark, dir, fromB - 1L, hiB)
          val capped = toB match {
            case Some(_) =>
              if (published < hiB)
                GraftDml.fail(s"feed batch ${published + 1} of $name " +
                  "is committed but not published (writer crashed " +
                  "between commit and publish?) — run " +
                  "Compaction.repairFeed, or bound the read with " +
                  s"TO $published")
              hiB
            case None => published
          }
          val c = org.apache.spark.sql.functions.col("batch")
          Compaction.readFeed(spark, dir)
            .filter(c >= fromB && c <= capped)
        }
      case v: CreateMv => Some(runCreateMv(spark, v))
      case RefreshMv(name) =>
        Some(Seq((name, refreshMv(spark, viewDirOf(spark, name))))
          .toDF("view", "batches_applied"))
      case RebuildMv(name) =>
        val viewDir = viewDirOf(spark, name)
        rebuildMv(spark, viewDir)
        Some(Seq((name, viewDir)).toDF("view", "location"))
      case RefreshAllMv(base) => Some(runRefreshAllMv(spark, base))
      case DropMv(name) => Some(runDropMv(spark, name))
    }
  }

  /** Resolve `name` (registered, or a graft-catalog identifier) to its
    * table dir with NO table-type gate — the inspection verbs serve
    * merge and scd2 tables alike.
    */
  private def anyDirFor(spark: SparkSession,
      name: String): Option[String] = {
    val parts = GraftDml.splitIdentifier(name)
    if (parts.size == 1) GraftTables.dirOf(spark, parts.head)
    else {
      val cat = try spark.sessionState.catalogManager.catalog(parts.head)
        catch { case scala.util.control.NonFatal(_) => return None }
      cat match {
        case g: graft.catalog.GraftCatalog =>
          val ident = org.apache.spark.sql.connector.catalog.Identifier
            .of(parts.tail.init.toArray, parts.last)
          if (g.tableExists(ident)) Some(g.tableDir(ident)) else None
        case _ => None
      }
    }
  }

  /** Resolve `name` (registered, or a graft-catalog identifier) to a
    * table dir REQUIRED to be scd2 — the inverse gate of
    * [[GraftDml.resolveName]], which refuses scd2 for merge DML.
    */
  private def scd2DirFor(spark: SparkSession,
      name: String): Option[String] =
    anyDirFor(spark, name).map { dir =>
      val t = TxLog.latest(spark, dir).flatMap(_.prop("table_type"))
      if (!t.contains("scd2"))
        GraftDml.fail(s"$name is a ${t.getOrElse("?")} table; EXPIRE " +
          "HISTORY applies to scd2 history tables — merge tables " +
          "retire time partitions with RETIRE PARTITIONS, or vacuum")
      dir
    }

  // ---- derived-table DDL: materialized views over maintained tables ----
  //
  // The SQL surface for graft.cdc.AggView + MvRewrite (r9 item 4):
  //
  //   CREATE MATERIALIZED VIEW mv AS
  //     SELECT k1[, k2 ...], count(*) AS cnt, sum(v) AS total
  //     FROM base GROUP BY k1[, k2 ...]
  //   REFRESH MATERIALIZED VIEW mv   -- apply the base's unapplied feed
  //   REFRESH ALL MATERIALIZED VIEWS ON base   -- sweep every rollup
  //   DROP MATERIALIZED VIEW mv
  //
  // A base may carry SEVERAL rollups; the rewrite serves the cheapest
  // matching one (fewest partial bytes). CREATE with an existing
  // identical definition RE-ATTACHES the durable view (sidecar +
  // manifest) instead of re-seeding it — the post-restart recovery
  // path; a different definition under the same name re-creates.
  //
  // The SELECT shape is exactly what AggView stores (per-key count +
  // DECIMAL sum partials — the aliases cnt/total ARE the state column
  // names); anything else fails with a message naming the contract.
  // CREATE seeds the view from the base's current state, fences it at
  // the base's published feed head, registers the MvRewrite so an
  // UNCHANGED aggregate over the base (summing the view's exact
  // decimal(18,2) measure shape) rolls partials up instead of
  // rescanning, and persists the definition as a sidecar under the
  // view dir. REFRESH applies feed batches through the contiguous
  // published head (a crashed publish pauses refresh, never skips).
  // Freshness is fenced either way: while the view lags the base's
  // feed, MvRewrite serves the BASE (MvFreshnessSpec's contract).

  /** (session, lowercase mv name) → view dir; session-scoped like the
    * table registry (the sidecar makes the definition durable).
    */
  private val mvRegistry = TrieMap.empty[(SparkSession, String), String]

  private def mvDefPath(viewDir: String) =
    new org.apache.hadoop.fs.Path(s"$viewDir/_mvdef.properties")

  private def writeMvDef(spark: SparkSession, viewDir: String,
      baseDir: String, keys: Seq[String], valueCol: String,
      baseFeedEpoch: Long, minMax: Boolean): Unit = {
    val p = new java.util.Properties()
    p.setProperty("base_dir", baseDir)
    p.setProperty("keys", keys.mkString(","))
    p.setProperty("value_col", valueCol)
    p.setProperty("minmax", minMax.toString)
    // the base feed EPOCH this view was seeded under: a base RESTORE
    // bumps it, and REFRESH re-seeds instead of applying pre-restore
    // events (which would converge the view to the pre-restore state)
    p.setProperty("base_feed_epoch", baseFeedEpoch.toString)
    val out = TxLog.fs(spark, viewDir).create(mvDefPath(viewDir), true)
    try p.store(out, null) finally out.close()
  }

  /** The durable view definition, read in ONE sidecar open (review
    * r13 — epoch/minmax were separate re-reads). Epoch defaults to 0
    * (a sidecar written before epochs existed matches a never-
    * restored base); minmax defaults false.
    */
  private final case class MvSidecar(baseDir: String, keys: Seq[String],
      valueCol: String, baseFeedEpoch: Long, minMax: Boolean)

  private def readMvDef(spark: SparkSession,
      viewDir: String): MvSidecar = {
    val p = new java.util.Properties()
    val in = TxLog.fs(spark, viewDir).open(mvDefPath(viewDir))
    try p.load(in) finally in.close()
    MvSidecar(p.getProperty("base_dir"),
      p.getProperty("keys").split(",").toSeq.filter(_.nonEmpty),
      p.getProperty("value_col"),
      Option(p.getProperty("base_feed_epoch")).map(_.toLong).getOrElse(0L),
      Option(p.getProperty("minmax")).contains("true"))
  }

  private def viewDirOf(spark: SparkSession, name: String): String =
    mvRegistry.getOrElse((spark, name),
      GraftDml.fail(s"unknown materialized view $name in this session — " +
        "CREATE MATERIALIZED VIEW re-attaches it (same name " +
        "re-creates/replaces; definitions persist as " +
        "_mvdef.properties under <base>/_mv/<name>)"))

  private def runCreateMv(spark: SparkSession,
      v: GraftVerbs.CreateMv): DataFrame = {
    import spark.implicits._
    val name = v.name
    val keys = v.keys
    val baseDir = GraftDml.resolveName(spark,
      GraftDml.splitIdentifier(v.base)).map(_.dir).getOrElse(
      GraftDml.fail(
        s"${v.base} is not a registered or catalog maintained table"))
    require(Compaction.feedEnabled(spark, baseDir),
      s"${v.base} has no change data feed ('feed'='true'): a " +
        "materialized view cannot refresh without it")
    // validate the declared columns against the base's CURRENT schema
    // up front — after a shape-changing REPLACE, both the fresh seed
    // and the sidecar re-attach would otherwise surface the seed
    // SELECT's raw unresolved-column error (r14 verdict item 2: every
    // re-seed/attach entry point names the replace)
    TxLog.latest(spark, baseDir).foreach { snap =>
      val baseCols = org.apache.spark.sql.types.DataType
        .fromJson(snap.props("schema_json"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.map(_.toLowerCase).toSet
      val missing = (keys :+ v.valueCol)
        .filterNot(c => baseCols(c.toLowerCase))
      if (missing.nonEmpty)
        GraftDml.fail(
          s"cannot create materialized view $name: column(s) " +
            s"${missing.mkString(", ")} do not exist on ${v.base} " +
            "as it stands — if the table was REPLACEd since the view " +
            "was defined, re-CREATE the view against the new schema")
    }
    // a base may carry SEVERAL rollups (r10 item 5): each view
    // registers under its own dir and the rewrite serves the
    // cheapest matching one, so no shadowing/one-per-base fence
    // is needed anymore.
    val viewDir = s"$baseDir/_mv/$name"
    // RE-ATTACH instead of re-seed (r10 advice): after a restart
    // the session registry is empty but the sidecar + manifest are
    // durable — a CREATE matching the existing definition
    // re-registers the healthy view as-is instead of paying a full
    // rebuild from a fresh base snapshot (a DIFFERENT definition
    // under the same name still re-creates).
    val existing = scala.util.Try(readMvDef(spark, viewDir)).toOption
      .filter { d =>
        d.baseDir == baseDir &&
          d.keys.map(_.toLowerCase) == keys.map(_.toLowerCase) &&
          d.valueCol.equalsIgnoreCase(v.valueCol) &&
          d.minMax == v.minMax &&
          TxLog.latest(spark, viewDir).isDefined &&
          // an INVALIDATED min/max view never re-attaches healthy —
          // the same CREATE re-creates it instead
          TxLog.latest(spark, viewDir)
            .forall(_.prop("invalid").isEmpty)
      }
    if (existing.isDefined) {
      val (_, _, _, attachedAt) =
        graft.cdc.AggView.readMeta(spark, viewDir)
      Mv.registerAggView(spark, viewDir, baseDir, Some(baseDir))
      mvRegistry.put((spark, name), viewDir)
      return Seq((name, viewDir, attachedAt))
        .toDF("view", "location", "as_of_batch")
    }
    val (_, _, _, nBuckets) = Compaction.readMeta(spark, baseDir)
    // seed and fence from ONE manifest snapshot: reading the head
    // first and the data later would double-count a merge landing
    // in between (seeded AND re-applied by the first REFRESH —
    // signed-retraction IVM is not replay-convergent the way a
    // keyed merge is)
    val snap = graft.cdc.TxLog.latest(spark, baseDir).getOrElse(
      GraftDml.fail(s"no committed manifest under $baseDir"))
    val head = snap.counter("next_feed_batch") - 1L
    graft.cdc.AggView.init(
      Compaction.readAsOf(spark, baseDir, snap.version)
        .select((keys :+ v.valueCol).map(col): _*),
      viewDir, keys, v.valueCol, nBuckets, batchId = head,
      minMax = v.minMax)
    writeMvDef(spark, viewDir, baseDir, keys, v.valueCol,
      snap.counter("feed_epoch"), v.minMax)
    Mv.registerAggView(spark, viewDir, baseDir, Some(baseDir))
    mvRegistry.put((spark, name), viewDir)
    Seq((name, viewDir, head)).toDF("view", "location", "as_of_batch")
  }

  private def runRefreshAllMv(spark: SparkSession,
      base: String): DataFrame = {
    import spark.implicits._
    val baseDir = GraftDml.resolveName(spark,
      GraftDml.splitIdentifier(base)).map(_.dir).getOrElse(
      GraftDml.fail(
        s"$base is not a registered or catalog maintained table"))
    val fs = TxLog.fs(spark, baseDir)
    val mvRoot = new org.apache.hadoop.fs.Path(s"$baseDir/_mv")
    // sidecar AND an intact manifest (same gate as CREATE's
    // re-attach): a half-deleted view dir must be skipped, not
    // abort the whole sweep and starve the healthy siblings
    val names =
      if (!fs.exists(mvRoot)) Nil
      else fs.listStatus(mvRoot).toSeq.map(_.getPath.getName).sorted
        .filter(n => fs.exists(mvDefPath(s"$baseDir/_mv/$n")) &&
          TxLog.latest(spark, s"$baseDir/_mv/$n").isDefined)
    val rows = names.map { n =>
      val viewDir = s"$baseDir/_mv/$n"
      // a view unknown to this session (post-restart) re-attaches
      // from its durable sidecar as part of the sweep
      mvRegistry.putIfAbsent((spark, n), viewDir)
      (n, refreshMv(spark, viewDir))
    }
    rows.toDF("view", "batches_applied")
  }

  private def runDropMv(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val viewDir = viewDirOf(spark, name)
    val baseDir = readMvDef(spark, viewDir).baseDir
    // deregister only OUR rewrite: the base may carry sibling
    // views (and programmatic registrations), which stay armed
    Mv.deregister(baseDir, viewDir)
    mvRegistry.remove((spark, name))
    TxLog.fs(spark, viewDir).delete(
      new org.apache.hadoop.fs.Path(viewDir), true)
    Seq(name).toDF("dropped_view")
  }

  /** Apply the base's unapplied published feed batches to one view and
    * (re-)arm its rewrite; returns the number of batches applied.
    * Shared by REFRESH MATERIALIZED VIEW and the REFRESH ALL sweep.
    */
  /** Re-seed a view wholesale from the base's CURRENT snapshot — the
    * one-snapshot seed CREATE uses (data and the feed-head fence come
    * from the SAME manifest read, so a merge landing in between can
    * never double-count). Crash-convergent: the AggView init commits
    * first, the sidecar epoch records second — a crash between just
    * re-seeds again.
    */
  private def reseedMv(spark: SparkSession, viewDir: String,
      mvDef: MvSidecar, baseSnap: TxLog.Snapshot): Unit = {
    // a REPLACE may have re-defined the base's columns out from under
    // the view — name the cause instead of surfacing the re-seed
    // SELECT's unresolved-column error (r14 review)
    val baseCols = org.apache.spark.sql.types.DataType
      .fromJson(baseSnap.props("schema_json"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.map(_.toLowerCase).toSet
    val missing = (mvDef.keys :+ mvDef.valueCol)
      .filterNot(c => baseCols(c.toLowerCase))
    if (missing.nonEmpty)
      GraftDml.fail(
        s"cannot re-seed the materialized view at $viewDir: its " +
          s"definition references column(s) ${missing.mkString(", ")} " +
          s"that no longer exist on the base (${mvDef.baseDir} was " +
          "REPLACEd or altered); DROP the view and re-CREATE it " +
          "against the new schema")
    val (_, _, _, nBuckets) = Compaction.readMeta(spark, mvDef.baseDir)
    val head = baseSnap.counter("next_feed_batch") - 1L
    graft.cdc.AggView.init(
      Compaction.readAsOf(spark, mvDef.baseDir, baseSnap.version)
        .select((mvDef.keys :+ mvDef.valueCol).map(col): _*),
      viewDir, mvDef.keys, mvDef.valueCol, nBuckets, batchId = head,
      minMax = mvDef.minMax)
    writeMvDef(spark, viewDir, mvDef.baseDir, mvDef.keys,
      mvDef.valueCol, baseSnap.counter("feed_epoch"), mvDef.minMax)
    Mv.registerAggView(spark, viewDir, mvDef.baseDir,
      Some(mvDef.baseDir))
  }

  /** ALTER MATERIALIZED VIEW v REBUILD: an unconditional [[reseedMv]]
    * — the one-statement remedy for an INVALIDATED min/max view
    * (r13 handoff item 6), and a forced full refresh otherwise. The
    * rebuild clears the `invalid` marker by construction (init
    * replaces the view's manifest lineage wholesale).
    */
  private def rebuildMv(spark: SparkSession, viewDir: String): Unit = {
    val mvDef = readMvDef(spark, viewDir)
    val baseSnap = graft.cdc.TxLog.latest(spark, mvDef.baseDir)
      .getOrElse(GraftDml.fail(
        s"no committed manifest under ${mvDef.baseDir}"))
    reseedMv(spark, viewDir, mvDef, baseSnap)
  }

  private def refreshMv(spark: SparkSession, viewDir: String): Long = {
    val mvDef = readMvDef(spark, viewDir)
    val (baseDir, keys, valueCol) =
      (mvDef.baseDir, mvDef.keys, mvDef.valueCol)
    // RESTORE fence (r12): the base moved BACKWARD under the view —
    // applying the still-unapplied (pre-restore) feed events would
    // converge the partials to the PRE-restore state. Signed IVM
    // cannot express the move, but the view knows its own definition:
    // re-seed wholesale from the restored base (the same one-snapshot
    // seed CREATE uses) and record the new epoch. Until this runs,
    // MvRewrite's freshness fence already serves the base (the
    // restore's reserved batch keeps the view's applied id behind the
    // head), so no stale answer is ever served.
    val baseSnap = graft.cdc.TxLog.latest(spark, baseDir).getOrElse(
      GraftDml.fail(s"no committed manifest under $baseDir"))
    // an invalidated min/max view refuses refresh loudly: applying
    // past the retraction would store wrong extremes, and silently
    // re-seeding would hide that the view's append-only contract is
    // being violated on every refresh
    TxLog.latest(spark, viewDir).flatMap(_.prop("invalid"))
      .foreach(reason => GraftDml.fail(
        s"materialized view at $viewDir is invalidated ($reason) — " +
          "DROP and re-CREATE it (or re-create it without " +
          "min/max partials)"))
    val baseEpoch = baseSnap.counter("feed_epoch")
    if (baseEpoch != mvDef.baseFeedEpoch) {
      reseedMv(spark, viewDir, mvDef, baseSnap)
      return 0L
    }
    val (_, _, _, last) = graft.cdc.AggView.readMeta(spark, viewDir)
    val srcHead = graft.cdc.Replicator.sourceHead(spark, baseDir)
    // retention fence (same rule as Replicator.sync, r10 advice):
    // feed retention that outran the view's last-applied batch must
    // fail loudly — publishedThrough alone returns `last` both for a
    // crashed publish (pause, recoverable) and for a retention-deleted
    // batch (permanent), and silently applying nothing forever would
    // disarm the rewrite with no signal
    if (srcHead > last) {
      // the RECORDED horizon is authoritative when present: retention
      // always stamps it before deleting, and it never crosses a
      // recoverable lost publish — so a missing batch at/above it is a
      // crashed publish (pause below, repairFeed recovers), never a
      // retention gap. Oldest-surviving-dir is the legacy fallback for
      // pre-marker feeds only (self-review r11: classifying by oldest
      // dir misread a repairable gap as permanent).
      val (hz, minDir) = Compaction.feedFloor(spark, baseDir)
      val minAvail =
        if (hz > 0L) hz else minDir.getOrElse(srcHead + 1L)
      if (last + 1L < minAvail)
        GraftDml.fail(
          s"base feed batches ${last + 1}..${minAvail - 1} were " +
            "removed by retention (maintain maxFeedAge/vacuum) — the " +
            "view cannot refresh incrementally; DROP and re-CREATE " +
            "it to re-seed from the current base snapshot")
    }
    // contiguous published head: a committed-but-unpublished batch
    // pauses refresh at the gap instead of being skipped forever
    val head = graft.cdc.Replicator.publishedThrough(spark, baseDir,
      last, srcHead)
    if (head > last)
      graft.cdc.AggView.applyFeed(spark, viewDir,
        Compaction.readFeed(spark, baseDir)
          .filter(col("batch") > last && col("batch") <= head),
        batchId = head)
    Mv.registerAggView(spark, viewDir, baseDir, Some(baseDir))
    math.max(0L, head - last)
  }

  /** Continuous change subscription for a maintained table by NAME
    * (registry or catalog identifier): the feed's data-row stream
    * (`FeedBatchSource` with `emitRows`) — table schema +
    * `_change_type` + `batch`, checkpointed feed-batch offsets,
    * `maxBatchesPerTrigger` admission control via the returned
    * reader's options.
    */
  def changeStream(spark: SparkSession, name: String): DataFrame = {
    val parts = name.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    val dir = GraftDml.resolveName(spark, parts).map(_.dir).getOrElse(
      GraftDml.fail(s"$name is not a registered or catalog " +
        "maintained table"))
    spark.readStream
      .format("graft.streaming.FeedBatchSource")
      .option("path", dir)
      .option("emitRows", "true")
      .load()
  }
}

/** Resolution rule lowering DML plans over [[GraftTables]]-registered
  * names to runnable merge commands. Injected by
  * [[graft.GraftExtensions]]; runs in the analyzer's Resolution batch,
  * BEFORE the row-level-command rewrite that would reject a
  * non-catalog target.
  */
object GraftDml extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    SparkSession.getActiveSession match {
      case None => plan
      case Some(spark) => plan match {
        // DML is always the plan root; no transform needed
        case _ => lower(spark, plan).getOrElse(plan)
      }
    }

  /** The last name part of the DML target, whether still unresolved or
    * already substituted by the temp view (SubqueryAlias keeps the
    * registered name).
    */
  private[plans] def publicTargetName(p: LogicalPlan): Option[String] =
    targetName(p)

  private def targetName(p: LogicalPlan): Option[String] = p match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      Some(u.multipartIdentifier.last)
    case SubqueryAlias(id, _) => Some(id.name)
    case _ => None
  }

  /** Resolve a DML target to (display name, table dir): the session
    * registry first (temp-view front door), then the `graft` catalog —
    * an unresolved `graft.ns.t` identifier looked up through the
    * catalog plugin, or an already-resolved DataSourceV2Relation over
    * a [[graft.catalog.GraftTable]] (the analyzer may resolve the
    * relation before this rule fires; both shapes must lower).
    */
  private[plans] final case class Target(name: String, dir: String,
      retain: Boolean)

  private def resolveTarget(spark: SparkSession,
      p: LogicalPlan): Option[Target] = p match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      // a QUALIFIED identifier (graft.ns.t) is never a registry name:
      // consulting the registry with just the last part would silently
      // mutate a same-named registered table instead of the catalog one
      (if (u.multipartIdentifier.size == 1)
        GraftTables.dirOf(spark, u.multipartIdentifier.last)
          .map(d => Target(u.multipartIdentifier.last, d, retain = false))
      else None)
        .orElse(catalogDir(spark, u.multipartIdentifier))
    case SubqueryAlias(id, child) =>
      resolveTarget(spark, child)
        .orElse(GraftTables.dirOf(spark, id.name)
          .map(d => Target(id.name, d, retain = false)))
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.catalog.GraftTable =>
          if (t.asOf.nonEmpty)
            fail("cannot run DML against a time-travel (AS OF) table")
          // catalog tables keep history (the table-format semantic:
          // VERSION AS OF works until an explicit vacuum)
          Some(Target(t.name(), t.dir, retain = true))
        case _ => None
      }
    case _ => None
  }

  /** Multipart identifier -> graft-catalog table dir, when its head
    * names a registered [[graft.catalog.GraftCatalog]] and the table
    * exists there. Errors (catalog missing, wrong plugin type) mean
    * "not ours" — the plan is left for Spark to resolve or reject.
    */
  /** Name-based resolution for entry points that have no LogicalPlan
    * (maintenance SQL, change streams): registry for a bare name,
    * catalog for a qualified one.
    */
  /** Multipart-identifier split that respects backtick quoting: dots
    * inside `` `quoted.parts` `` are identifier characters, not
    * separators, and doubled backticks unescape (Spark's own quoting
    * rule) — `VACUUM \`my.table\`` resolves the one registered name
    * instead of silently splitting into `my`.`table`.
    */
  private[plans] def splitIdentifier(name: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var quoted = false
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == '`') {
        if (quoted && i + 1 < name.length && name.charAt(i + 1) == '`') {
          cur.append('`'); i += 1 // escaped backtick inside quotes
        } else quoted = !quoted
      } else if (c == '.' && !quoted) {
        parts += cur.result(); cur.clear()
      } else cur.append(c)
      i += 1
    }
    parts += cur.result()
    parts.toSeq
  }

  private[plans] def resolveName(spark: SparkSession,
      parts: Seq[String]): Option[Target] =
    (if (parts.size == 1)
      GraftTables.dirOf(spark, parts.head)
        .map(d => Target(parts.head, d, retain = false))
    else None).orElse(catalogDir(spark, parts))

  private def catalogDir(spark: SparkSession,
      parts: Seq[String]): Option[Target] = {
    if (parts.size < 2) return None
    // a missing/foreign catalog means "not ours" — but once the head
    // IS a graft catalog holding the table, errors below (wrong table
    // type) must propagate, not silently fall through to spark.sql
    val cat = try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case scala.util.control.NonFatal(_) => return None }
    cat match {
      case g: graft.catalog.GraftCatalog =>
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.tail.init.toArray, parts.last)
        if (g.tableExists(ident)) {
          val dir = g.tableDir(ident)
          // same invariant as GraftCatalog.loadTable: DML and
          // maintenance carry merge (latest-state) semantics — an
          // Scd2/AggView dir resolved by name must fail loudly here,
          // not get a table_type=merge manifest stamped over it
          val t = graft.cdc.TxLog.latest(spark, dir)
            .flatMap(_.prop("table_type"))
          if (!t.forall(_ == "merge"))
            fail(s"${parts.mkString(".")} is a ${t.get} table; " +
              "MERGE/UPDATE/DELETE/maintenance apply to merge " +
              "(latest-state) tables — use the Scd2/AggView APIs")
          Some(Target(parts.mkString("."), dir, retain = true))
        } else None
      case _ => None
    }
  }

  private[plans] def lower(spark: SparkSession,
      plan: LogicalPlan): Option[LeafRunnableCommand] = plan match {
    case m: MergeIntoTable =>
      resolveTarget(spark, m.targetTable).map { t =>
        GraftMergeIntoCommand(t.name, t.dir, m.targetTable, m.sourceTable,
          m.mergeCondition, m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions, t.retain)
      }
    case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
      // catalog-table INSERTs take Spark's standard v2 write path
      // (AppendData -> V1Write -> one merge); only registry temp-view
      // targets need the lowering
      for {
        name <- targetName(i.table)
        dir <- GraftTables.dirOf(spark, name)
      } yield {
        if (i.overwrite || i.partitionSpec.nonEmpty ||
            i.ifPartitionNotExists)
          GraftDml.fail("only plain INSERT INTO <table> SELECT … is " +
            "supported on maintained tables (no OVERWRITE/partitions)")
        GraftInsertCommand(name, dir, i.query)
      }
    case u: UpdateTable =>
      resolveTarget(spark, u.table).map { t =>
        GraftUpdateCommand(t.name, t.dir, u.assignments, u.condition,
          t.retain)
      }
    case d: DeleteFromTable =>
      resolveTarget(spark, d.table).map { t =>
        GraftDeleteCommand(t.name, t.dir, Option(d.condition), t.retain)
      }
    case _ => None
  }

  /** Strip qualifiers so a condition written against `src.c` or `t.c`
    * applies to a bare DataFrame carrying column `c`, then render to
    * SQL for `functions.expr` (version-stable: no internal Column
    * constructors).
    */
  private[plans] def bare(e: Expression): String =
    e.transform {
      case UnresolvedAttribute(parts) => UnresolvedAttribute(Seq(parts.last))
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  /** The read-modify-write loop SQL UPDATE/DELETE share: resolve the
    * table WITH its version in one manifest read, let the caller derive
    * the changelog from that exact snapshot, and commit it with the
    * version pinned (`expectedBase`). A concurrent commit in the window
    * surfaces as [[graft.cdc.TxLog.StaleBase]] — the changelog is
    * rebuilt from the NEW snapshot and retried, so the statement
    * applies to what the table actually holds instead of overwriting
    * the concurrent writer with stale pre-images.
    */
  private[plans] def rmwLoop(spark: SparkSession, dir: String,
      name: String, retain: Boolean = false)
      (derive: DataFrame => DataFrame): Unit = {
    val maxAttempts = 8
    var attempt = 0
    var done = false
    while (!done) {
      val (base, current) = Compaction.readWithVersion(spark, dir)
      val changelog = derive(current)
      try {
        Compaction.merge(spark, dir, changelog, retainHistory = retain,
          expectedBase = Some(base))
        done = true
      } catch {
        case _: graft.cdc.TxLog.StaleBase if attempt < maxAttempts =>
          attempt += 1
        // a concurrent writer's vacuum can delete our snapshot's files
        // between the fence check and the changelog materialization —
        // the same staleness, surfaced by the scan instead of the
        // fence: rebuild from the new snapshot exactly like StaleBase
        case e: Exception if attempt < maxAttempts && isVacuumedRead(e) =>
          attempt += 1
      }
    }
    GraftTables.refresh(spark, name)
  }

  /** A scan failure caused by the snapshot's files being vacuumed
    * underneath an in-flight read (Spark's FAILED_READ_FILE /
    * FileNotFound anywhere in the cause chain) — for a pinned-base
    * read-modify-write this means the base is stale, not that data is
    * lost: the current snapshot has the rows.
    */
  private def isVacuumedRead(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists {
      t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
        // Spark's task-level wrapper for a file deleted mid-scan; a
        // broader message match (e.g. any "does not exist") would loop
        // 8 rebuild cycles on unrelated persistent errors
        Option(t.getMessage).exists(_.contains("FAILED_READ_FILE"))
    }

  private[plans] def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", // generic internal-error class with message slot
      messageParameters = Map("message" -> s"graft SQL DML: $msg"))

  /** Validate that the ON condition is a conjunction equating every
    * merge-key column (by name on both sides) and nothing else the
    * lowering would silently ignore.
    */
  private[plans] def requireKeyEquality(cond: Expression,
      keys: Seq[String]): Unit = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case o => Seq(o)
    }
    def lastName(e: Expression): Option[String] = e match {
      case UnresolvedAttribute(parts) => Some(parts.last.toLowerCase)
      case a: AttributeReference => Some(a.name.toLowerCase)
      case _ => None
    }
    val cs = conjuncts(cond)
    val matched = cs.collect {
      case EqualTo(l, r) if lastName(l).isDefined &&
          lastName(l) == lastName(r) => lastName(l).get
    }
    val want = keys.map(_.toLowerCase).toSet
    if (cs.size != keys.size || matched.toSet != want || matched.size != keys.size)
      fail(s"MERGE ON must equate exactly the merge key columns " +
        s"(${keys.mkString(", ")}); got: ${cond.sql}")
  }
}

/** MERGE INTO <registered> USING <source> — lowered to one
  * [[Compaction.merge]] of the source as a changelog batch.
  */
final case class GraftMergeIntoCommand(name: String, dir: String,
    target: LogicalPlan, source: LogicalPlan, condition: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction],
    retain: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  /** `UPDATE SET *` / `INSERT *` as written, OR the identity-assignment
    * form the analyzer expands them into before our resolution rule
    * runs (assignment(t.c, s.c) per column, names matching).
    */
  private def isStarAssignments(assignments: Seq[Assignment]): Boolean =
    assignments.nonEmpty && assignments.forall { a =>
      def nameOf(e: Expression): Option[String] = e match {
        case UnresolvedAttribute(parts) => Some(parts.last.toLowerCase)
        case ar: AttributeReference => Some(ar.name.toLowerCase)
        case _ => None
      }
      nameOf(a.key).isDefined && nameOf(a.key) == nameOf(a.value)
    }

  /** A WHEN MATCHED AND <cond> may only reference SOURCE columns: the
    * lowering evaluates it on the source batch, and silently reading a
    * same-named TARGET column's pre-image instead would be wrong, not
    * approximate.
    */
  private def requireSourceOnly(c: Expression): Unit = {
    val tName = GraftDml.publicTargetName(target)
    c.foreach {
      case UnresolvedAttribute(parts)
          if parts.size > 1 &&
            tName.exists(parts(parts.size - 2).equalsIgnoreCase) =>
        GraftDml.fail(s"MERGE clause condition may only reference source " +
          s"columns; got target reference ${parts.mkString(".")}")
      case ar: AttributeReference =>
        val targetIds = scala.util.Try(target.outputSet).toOption
        if (targetIds.exists(_.contains(ar)))
          GraftDml.fail(s"MERGE clause condition may only reference " +
            s"source columns; got target reference ${ar.name}")
      case _ => ()
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val (keyProp, versionCol, deleteCol, _) = Compaction.readMeta(spark, dir)
    val keys = keyProp.split(",").toSeq
    GraftDml.requireKeyEquality(condition, keys)
    if (notMatchedBySourceActions.nonEmpty)
      GraftDml.fail("WHEN NOT MATCHED BY SOURCE is not supported")

    val deleteCond: Option[Option[String]] = matchedActions.collectFirst {
      case DeleteAction(c) =>
        c.foreach(requireSourceOnly)
        c.map(GraftDml.bare)
    }
    val hasUpdateStar = matchedActions.exists {
      case UpdateStarAction(None) => true
      case UpdateStarAction(Some(_)) =>
        GraftDml.fail("WHEN MATCHED AND <cond> THEN UPDATE SET * is not " +
          "supported; put the condition on the DELETE clause")
      case ua: org.apache.spark.sql.catalyst.plans.logical.UpdateAction
          if ua.condition.isEmpty && isStarAssignments(ua.assignments) =>
        true
      case _ => false
    }
    val hasInsertStar = notMatchedActions match {
      case Nil => false
      case Seq(InsertStarAction(None)) => true
      case Seq(ia: org.apache.spark.sql.catalyst.plans.logical.InsertAction)
          if ia.condition.isEmpty && isStarAssignments(ia.assignments) =>
        true
      case other => GraftDml.fail(
        s"only WHEN NOT MATCHED THEN INSERT * is supported; got $other")
    }
    matchedActions.foreach {
      case _: UpdateStarAction | _: DeleteAction => ()
      case ua: org.apache.spark.sql.catalyst.plans.logical.UpdateAction
          if ua.condition.isEmpty && isStarAssignments(ua.assignments) => ()
      case other => GraftDml.fail(
        s"unsupported WHEN MATCHED action: $other (use UPDATE SET * / DELETE)")
    }
    if (!hasUpdateStar && !hasInsertStar && deleteCond.isEmpty)
      GraftDml.fail("MERGE must have at least one supported action")
    if (hasUpdateStar != hasInsertStar)
      GraftDml.fail("UPDATE SET * and INSERT * must be used together " +
        "(the merge is an upsert); a delete-only MERGE omits both")

    val src = org.apache.spark.sql.GraftBridge.ofRows(spark, source)
    val tableCols = Compaction.read(spark, dir).columns.toSeq
    val missing = tableCols.filterNot(src.columns.contains)
    if (missing.nonEmpty)
      GraftDml.fail(s"source is missing table columns: " +
        missing.mkString(", "))

    val changelog =
      if (hasUpdateStar) {
        // upsert (+ optional conditional delete): source rows ARE the
        // changelog; a DELETE clause condition marks its rows as
        // tombstones on top of the source's own delete column
        deleteCond match {
          case None => src
          case Some(None) =>
            GraftDml.fail("WHEN MATCHED THEN DELETE without a condition " +
              "contradicts UPDATE SET * (every matched row would match " +
              "the first clause); add AND <cond>")
          case Some(Some(cSql)) =>
            src.withColumn(deleteCol,
              when(expr(cSql), lit(true)).otherwise(col(deleteCol)))
        }
      } else {
        // delete-only MERGE: matched source rows become tombstones;
        // unmatched tombstones are no-ops in the merge by definition
        val base = deleteCond match {
          case Some(Some(cSql)) => src.filter(expr(cSql))
          case _ => src
        }
        base.withColumn(deleteCol, lit(true))
      }

    Compaction.merge(spark, dir, changelog.select(tableCols.map(col): _*),
      retainHistory = retain)
    GraftTables.refresh(spark, name)
    Seq.empty
  }
}

/** INSERT INTO <registered> SELECT … — the rows ARE the changelog
  * (they must carry the table's full schema including version and
  * delete columns); an inserted key that already exists upserts by the
  * merge's version rule, exactly like the reference's ON CONFLICT
  * seed path.
  */
final case class GraftInsertCommand(name: String, dir: String,
    query: LogicalPlan) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val rows = org.apache.spark.sql.GraftBridge.ofRows(spark, query)
    val tableCols = Compaction.read(spark, dir).columns.toSeq
    val src =
      if (rows.columns.toSeq == tableCols) rows
      else if (rows.columns.length == tableCols.length)
        // positional INSERT (SELECT list without aliases): adopt the
        // table's column names, the SQL-standard by-position semantics
        rows.toDF(tableCols: _*)
      else GraftDml.fail(s"INSERT arity ${rows.columns.length} != " +
        s"table arity ${tableCols.length}")
    Compaction.merge(spark, dir, src)
    GraftTables.refresh(spark, name)
    Seq.empty
  }
}

/** UPDATE <registered> SET … [WHERE …] — the changelog is the CURRENT
  * matching rows with the assignments applied at their stored version;
  * the merge's change-beats-stored tie-break lands them.
  *
  * Two read-modify-write guarantees the naive lowering lacks:
  *  - every assignment RHS evaluates against the PRE-update row (SQL
  *    semantics): all new values are computed in ONE projection, so
  *    `SET a = b, b = a` swaps instead of copying;
  *  - the snapshot the changelog was derived from is pinned
  *    (`expectedBase`): if a concurrent writer commits between our
  *    read and our merge, the merge aborts with
  *    [[graft.cdc.TxLog.StaleBase]] and the WHOLE statement rebuilds
  *    against the new snapshot — the stale pre-images can never
  *    silently overwrite the concurrent write (lost update).
  */
final case class GraftUpdateCommand(name: String, dir: String,
    assignments: Seq[Assignment], condition: Option[Expression],
    retain: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (keyProp, versionCol, deleteCol, _) = Compaction.readMeta(spark, dir)
    val keys = keyProp.split(",").toSeq
    GraftDml.rmwLoop(spark, dir, name, retain) { current =>
      val filtered = condition match {
        case Some(c) => current.filter(expr(GraftDml.bare(c)))
        case None => current
      }
      val byTarget = assignments.map { a =>
        val target = GraftDml.bare(a.key).stripPrefix("`").stripSuffix("`")
        if (!current.columns.exists(_.equalsIgnoreCase(target)))
          GraftDml.fail(s"UPDATE SET targets unknown column $target")
        // assigning a KEY column would upsert a NEW key and leave the
        // old row behind (a silent duplicate, not a move); assigning
        // the version or tombstone columns would corrupt the merge's
        // reconciliation. Refuse all three rather than mis-apply.
        if (keys.exists(_.equalsIgnoreCase(target)))
          GraftDml.fail(s"UPDATE may not change merge key column $target " +
            "(delete the old key and insert the new one)")
        if (versionCol.equalsIgnoreCase(target) ||
            deleteCol.equalsIgnoreCase(target))
          GraftDml.fail(s"UPDATE may not change engine column $target " +
            "(versions advance via MERGE; deletes via DELETE)")
        target.toLowerCase -> a.value
      }
      if (byTarget.map(_._1).distinct.size != byTarget.size)
        GraftDml.fail("UPDATE SET assigns the same column twice")
      val lookup = byTarget.toMap
      // ONE projection: every RHS sees the pre-update row, per SQL
      filtered.select(current.columns.map { c =>
        lookup.get(c.toLowerCase) match {
          case Some(rhs) => expr(GraftDml.bare(rhs)).as(c)
          case None => col(c)
        }
      }: _*)
    }
    Seq.empty
  }
}

/** DELETE FROM <registered> [WHERE …] — the changelog is the CURRENT
  * matching rows as tombstones at their stored version, derived and
  * committed under the same [[GraftDml.rmwLoop]] stale-base fence as
  * UPDATE (a concurrent writer's rows are never resurrected by a
  * stale pre-image).
  */
final case class GraftDeleteCommand(name: String, dir: String,
    condition: Option[Expression],
    retain: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, _, deleteCol, _) = Compaction.readMeta(spark, dir)
    GraftDml.rmwLoop(spark, dir, name, retain) { current =>
      val filtered = condition match {
        case Some(c) => current.filter(expr(GraftDml.bare(c)))
        case None => current
      }
      filtered.withColumn(deleteCol, lit(true))
    }
    Seq.empty
  }
}
