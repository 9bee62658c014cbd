package graft.catalog

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.SparkSpec

/** Column-level statistics from the manifest
  * (`SupportsReportStatistics.columnStats`): merge keys report
  * distinctCount = rowCount (latest-state tables hold exactly one row
  * per key — the exact NDV a join-cardinality estimate needs, no
  * sampling job), and the version column reports typed global min/max
  * folded from the per-bucket zone maps. CBO join reordering and
  * broadcast decisions at 100 TB then act on real numbers, not
  * sizeInBytes alone.
  */
class ColumnStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-cstat-wh")
    spark.conf.set("spark.sql.catalog.gstat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstat.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  test("key NDV = rows, version min/max fold the zone maps, exposed to the optimizer") {
    sqlc("""CREATE TABLE gstat.t (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8')""")
    sqlc("""INSERT INTO gstat.t
        SELECT id, 1.0D, id % 3, false FROM range(300)""")

    val df = sqlc("SELECT * FROM gstat.t")
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.getOrElse(fail("no v2 scan relation in the optimized plan"))
    val stats = rel.stats
    assert(stats.rowCount.contains(BigInt(300)),
      s"manifest row count should reach the optimizer, got ${stats.rowCount}")
    val byName = stats.attributeStats.map {
      case (a, cs) => a.name.toLowerCase -> cs
    }
    assert(byName.get("id").exists(_.distinctCount.contains(BigInt(300))),
      s"key NDV should equal the row count, got ${byName.get("id")}")
    val vStat = byName.getOrElse("version",
      fail(s"no version column stat in ${byName.keys}"))
    assert(vStat.min.contains(0L) && vStat.max.contains(2L),
      s"version stats should fold the zone maps, got " +
        s"min=${vStat.min} max=${vStat.max}")
  }

  test("a filtered scan or a dirty table withholds the exact stats") {
    sqlc("""CREATE TABLE gstat.t2 (
        id BIGINT, v DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("INSERT INTO gstat.t2 SELECT id, 1.0D, 0L, false FROM range(100)")
    // a pushed filter changes what the scan produces: rows/NDV from
    // the manifest would overclaim, so they are withheld
    val filtered = sqlc("SELECT * FROM gstat.t2 WHERE id < 10")
    val rel = filtered.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.get
    assert(rel.stats.attributeStats.isEmpty,
      "filtered scans must not claim manifest-exact column stats")
  }

  test("the provably-small maintained side broadcasts in a join") {
    sqlc("""CREATE TABLE gstat.dim (
        id BIGINT, tag STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    sqlc("""INSERT INTO gstat.dim
        SELECT id, concat('t', id % 5), 0L, false FROM range(50)""")
    val bigPath = tmpDir("cstat-big")
    spark.range(50000).selectExpr("id % 50 AS id", "id AS x")
      .write.mode("overwrite").parquet(bigPath)
    spark.read.parquet(bigPath).createOrReplaceTempView("cstat_big")
    val q = sqlc("""SELECT count(*) AS n
        FROM cstat_big b JOIN gstat.dim d ON b.id = d.id""")
    assert(q.as[Long].head() == 50000L)
    val hasBhj = q.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin") || {
      // under AQE the broadcast shows in the final adaptive plan
      q.queryExecution.executedPlan.collectFirst {
        case b: BroadcastHashJoinExec => b
      }.isDefined
    }
    assert(hasBhj, "the 50-row maintained table should broadcast:\n" +
      q.queryExecution.executedPlan)
  }

  test("clusterBy columns report manifest min/max; a cluster-range " +
      "filter prunes bucket dirs (r12)") {
    sqlc("""CREATE TABLE gstat.cl (
        id BIGINT, price DOUBLE, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8',
          'cluster_by'='price')""")
    // price is a function of the WRITER'S OWN bucket hash
    // (pmod(xxhash64(id), 8) — graft.cdc.Bucketing's formula), so each
    // bucket's [cmin, cmax] range is disjoint: bucket b holds prices
    // [b*100, b*100+50)
    sqlc("""INSERT INTO gstat.cl
        SELECT id,
          CAST(pmod(xxhash64(id), 8) * 100 + id % 50 AS DOUBLE),
          0L, false FROM range(400)""")
    // 1. the optimizer sees the folded global min/max for price
    val df = sqlc("SELECT * FROM gstat.cl")
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.getOrElse(fail("no v2 scan relation"))
    val pStat = rel.stats.attributeStats.collectFirst {
      case (a, cs) if a.name.equalsIgnoreCase("price") => cs
    }.getOrElse(fail(s"no price column stat in " +
      s"${rel.stats.attributeStats.keys}"))
    assert(pStat.min.exists(_.asInstanceOf[Double] == 0.0) &&
      pStat.max.exists(_.asInstanceOf[Double] >= 700.0),
      s"price stats should fold cmin/cmax, got " +
        s"min=${pStat.min} max=${pStat.max}")
    // 2. a selective price range opens ONLY the matching bucket dir
    val one = sqlc(
      "SELECT id FROM gstat.cl WHERE price >= 200.0 AND price < 250.0")
    assert(one.count() > 0)
    def planned(q: org.apache.spark.sql.DataFrame): Set[Int] = {
      def walk(pl: org.apache.spark.sql.execution.SparkPlan)
          : Seq[Int] = pl match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b.inputPartitions.collect {
          case c: GraftCleanPartition => c.bucket
          case f: GraftFoldPartition => f.bucket
        }
        case o => o.children.flatMap(walk)
      }
      walk(q.queryExecution.executedPlan).toSet
    }
    val buckets = planned(one)
    assert(buckets == Set(2),
      s"price range [200, 250) lives in bucket 2 only; planned " +
        s"buckets $buckets")
  }

  test("the registered-view SQL route sees the same manifest stats: " +
      "the CBO broadcast flip fires on it too (r14)") {
    // the same maintained table served through BOTH front doors: the
    // DSv2 catalog and a registered parquet view — join strategy must
    // not diverge between them
    val dir = tmpDir("cstat-reg") + "/t"
    // big enough that the raw-size estimate of the aggregate stays
    // OVER the broadcast threshold — the flip is then attributable to
    // the NDV-derived row estimate, nothing else
    graft.cdc.Compaction.init(
      spark.range(40000).selectExpr("id", "id % 4 AS grp",
        "concat('pad-', id, '-', repeat('x', 64)) AS pad",
        "0L AS version", "false AS deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 8,
      clusterBy = Seq("grp"))
    graft.plans.GraftTables.register(spark, "cstat_reg_t", dir)
    graft.plans.MergePruning.ensureRegistered(spark)
    val bigPath = tmpDir("cstat-reg-big")
    spark.range(100000).selectExpr("id % 4 AS g", "id AS x")
      .write.mode("overwrite").parquet(bigPath)
    spark.read.parquet(bigPath).createOrReplaceTempView("cstat_reg_big")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def aggBroadcasts(): Boolean = {
        val q = spark.sql("""SELECT count(*) AS n FROM cstat_reg_big b
          JOIN (SELECT grp, count(*) AS c FROM cstat_reg_t GROUP BY grp) d
          ON b.g = d.grp""")
        assert(q.as[Long].head() == 100000L)
        q.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin")
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // the attached CatalogTable stats are visible on the relation
      val rel = spark.sql("SELECT * FROM cstat_reg_t")
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources
              .LogicalRelation => r
        }.getOrElse(fail("no LogicalRelation on the registered route"))
      val gStat = rel.stats.attributeStats.collectFirst {
        case (a, cs) if a.name.equalsIgnoreCase("grp") => cs
      }.getOrElse(fail(s"no grp column stat on the registered " +
        s"route; got ${rel.stats.attributeStats.keys}"))
      val ndv = gStat.distinctCount
        .getOrElse(fail("no distinctCount for grp")).toLong
      assert(ndv >= 3 && ndv <= 6, s"NDV(grp) should estimate ~4, got $ndv")
      assert(rel.stats.rowCount.exists(_.toLong == 40000L),
        s"manifest rowCount should attach, got ${rel.stats.rowCount}")
      // the flip itself — identical to the catalog-route case
      assert(aggBroadcasts(),
        "with CBO reading the manifest NDV through the registered " +
          "view, the 4-group aggregate should broadcast")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(!aggBroadcasts(),
        "without CBO the registered-route estimate stays scan-sized")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      prevAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      graft.plans.GraftTables.unregister(spark, "cstat_reg_t")
    }
  }

  test("a time-partitioned table on the registered route attaches " +
      "manifest stats and flips a broadcast under CBO (r15)") {
    val dir = tmpDir("cstat-tp-reg") + "/t"
    // 40k rows over 4 days, 4-valued cluster column, wide pad so the
    // raw-size estimate stays over the broadcast threshold — only the
    // NDV-derived row estimate can flip the join
    graft.cdc.Compaction.init(
      spark.range(40000).selectExpr("id", "id % 4 AS grp",
        "concat('pad-', id, '-', repeat('x', 64)) AS pad",
        "make_timestamp(2024, 1, CAST(1 + id % 4 AS INT), 12, 0, 0) AS ts",
        "0L AS version", "false AS deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 8,
      clusterBy = Seq("grp"), feed = false,
      timePartition = Some(("days", "ts")), ndvP = None)
    graft.plans.GraftTables.register(spark, "cstat_tp_t", dir)
    graft.plans.MergePruning.ensureRegistered(spark)
    val bigPath = tmpDir("cstat-tp-big")
    spark.range(100000).selectExpr("id % 4 AS g", "id AS x")
      .write.mode("overwrite").parquet(bigPath)
    spark.read.parquet(bigPath).createOrReplaceTempView("cstat_tp_big")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def aggBroadcasts(): Boolean = {
        val q = spark.sql("""SELECT count(*) AS n FROM cstat_tp_big b
          JOIN (SELECT grp, count(*) AS c FROM cstat_tp_t GROUP BY grp) d
          ON b.g = d.grp""")
        assert(q.as[Long].head() == 100000L)
        q.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin")
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rel = spark.sql("SELECT * FROM cstat_tp_t")
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources
              .LogicalRelation => r
        }.getOrElse(fail("no LogicalRelation on the registered route"))
      assert(rel.stats.rowCount.exists(_.toLong == 40000L),
        s"manifest rowCount should attach on the leaf-rooted tp " +
          s"scan, got ${rel.stats.rowCount}")
      val ndv = rel.stats.attributeStats.collectFirst {
        case (a, cs) if a.name.equalsIgnoreCase("grp") => cs
      }.flatMap(_.distinctCount)
        .getOrElse(fail("no NDV for grp on the tp route")).toLong
      assert(ndv >= 3 && ndv <= 6, s"NDV(grp) should estimate ~4, got $ndv")
      assert(aggBroadcasts(),
        "CBO + manifest NDV should broadcast the 4-group aggregate " +
          "on the time-partitioned registered route")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(!aggBroadcasts(),
        "the CBO-off control must stay scan-sized (no broadcast)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      prevAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      graft.plans.GraftTables.unregister(spark, "cstat_tp_t")
    }
  }

  test("a bucket-pruned registered-route scan drops the fabricated " +
      "full-table stats (r15)") {
    val dir = tmpDir("cstat-pruned") + "/t"
    graft.cdc.Compaction.init(
      spark.range(40000).selectExpr("id",
        "concat('pad-', id, '-', repeat('x', 64)) AS pad",
        "0L AS version", "false AS deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 8)
    graft.plans.GraftTables.register(spark, "cstat_pr_t", dir)
    graft.plans.MergePruning.ensureRegistered(spark)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def relOf(q: String) = spark.sql(q).queryExecution.optimizedPlan
        .collectFirst {
          case r: org.apache.spark.sql.execution.datasources
              .LogicalRelation => r
        }.getOrElse(fail(s"no LogicalRelation in: $q"))
      val full = relOf("SELECT * FROM cstat_pr_t")
      assert(full.stats.rowCount.exists(_.toLong == 40000L),
        s"full scan should carry manifest stats, got ${full.stats.rowCount}")
      // the point lookup scans 1 of 8 bucket dirs — reporting the
      // whole table's rowCount/NDV there would overstate cardinality
      // to CBO (and could block a broadcast the pruned scan merits);
      // the pruned copy must fall back to its own file sizes
      val pruned = relOf("SELECT * FROM cstat_pr_t WHERE id = 7")
      assert(pruned.stats.rowCount.isEmpty,
        s"pruned scan must not report full-table rowCount, got " +
          s"${pruned.stats.rowCount}")
      assert(pruned.stats.sizeInBytes < full.stats.sizeInBytes,
        "the pruned scan's size estimate should shrink with the scan")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      graft.plans.GraftTables.unregister(spark, "cstat_pr_t")
    }
  }

  test("ndv_p=10 tightens the sketch: wider registers, closer NDV, " +
      "ALTER re-sketches in place (r14/r15)") {
    sqlc("""CREATE TABLE gstat.ndvp (
        id BIGINT, grp BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4',
          'cluster_by'='grp', 'ndv_p'='10')""")
    // 600 distinct grp values: at p=6 (64 registers) the estimate is
    // ~13% stderr; at p=10 (1024 registers) ~3.2% — assert the tight
    // band only the wider sketch delivers
    sqlc("""INSERT INTO gstat.ndvp
        SELECT id, id % 600, 0L, false FROM range(6000)""")
    val dir = s"${warehouse}/ndvp"
    val snap = graft.cdc.TxLog.latest(spark, dir).get
    assert(snap.prop("ndv_p").contains("10"))
    val reg = snap.props.collectFirst {
      case (k, v) if k.startsWith("cndv.") => v }
      .getOrElse(fail("no cndv sketch recorded"))
    assert(reg.length == 2048,
      s"p=10 registers are 1024 x 2 chars, got ${reg.length}")
    val rel = sqlc("SELECT * FROM gstat.ndvp")
      .queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r
      }.getOrElse(fail("no v2 scan relation"))
    val ndv = rel.stats.attributeStats.collectFirst {
      case (a, cs) if a.name.equalsIgnoreCase("grp") => cs
    }.flatMap(_.distinctCount).getOrElse(fail("no NDV")).toLong
    assert(ndv >= 540 && ndv <= 660,
      s"p=10 should estimate 600 within ~10%, got $ndv")
    // ALTER changes the precision as a stats-only committed rewrite
    // (r15): every bucket's registers re-derive at the new width from
    // the committed files — and the data files stay byte-identical
    val filesBefore = graft.cdc.Compaction.read(spark, dir)
      .inputFiles.sorted.toSeq
    sqlc("ALTER TABLE gstat.ndvp SET TBLPROPERTIES ('ndv_p'='6')")
    val snap6 = graft.cdc.TxLog.latest(spark, dir).get
    assert(snap6.prop("ndv_p").contains("6"))
    assert(snap6.prop("op").contains("restat"),
      "the precision change commits as a stats-only restat")
    val reg6 = snap6.props.collectFirst {
      case (k, v) if k.startsWith("cndv.") => v }
      .getOrElse(fail("no cndv sketch after re-sketch"))
    assert(reg6.length == 128,
      s"p=6 registers are 64 x 2 chars, got ${reg6.length}")
    assert(graft.cdc.Compaction.read(spark, dir)
      .inputFiles.sorted.toSeq == filesBefore,
      "a precision change must not rewrite data files")
    // the NDV accuracy bound holds at the NEW precision (p=6 ~13%
    // stderr: 600 true distincts should estimate within ~3 sigma)
    val rel6 = sqlc("SELECT * FROM gstat.ndvp")
      .queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r
      }.getOrElse(fail("no v2 scan relation after re-sketch"))
    val ndv6 = rel6.stats.attributeStats.collectFirst {
      case (a, cs) if a.name.equalsIgnoreCase("grp") => cs
    }.flatMap(_.distinctCount).getOrElse(fail("no NDV after")).toLong
    assert(ndv6 >= 360 && ndv6 <= 840,
      s"p=6 should estimate 600 within the sketch bound, got $ndv6")
    // and back UP to p=10: the tight band returns
    sqlc("ALTER TABLE gstat.ndvp SET TBLPROPERTIES ('ndv_p'='10')")
    val snap10 = graft.cdc.TxLog.latest(spark, dir).get
    assert(snap10.props.collectFirst {
      case (k, v) if k.startsWith("cndv.") => v }.get.length == 2048)
    // out-of-range precision refuses at CREATE and at ALTER
    val e2 = intercept[Exception] {
      sqlc("""CREATE TABLE gstat.ndvp_bad (
        id BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'ndv_p'='15')""")
    }
    assert(e2.getMessage.contains("ndv_p"), e2.getMessage)
    val e3 = intercept[Exception] {
      sqlc("ALTER TABLE gstat.ndvp SET TBLPROPERTIES ('ndv_p'='15')")
    }
    assert(e3.getMessage.contains("ndv_p"), e3.getMessage)
  }

  test("cluster-column NDV from the per-bucket HLL sketches reaches " +
      "the optimizer and flips a join strategy under CBO (r13)") {
    sqlc("""CREATE TABLE gstat.ndv (
        id BIGINT, grp BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8',
          'cluster_by'='grp')""")
    sqlc("""INSERT INTO gstat.ndv
        SELECT id, id % 4, 0L, false FROM range(4000)""")
    // 1. the sketch-merged NDV is optimizer-visible and near-exact
    // (4 distinct values sit deep in HLL's linear-counting range)
    val rel = sqlc("SELECT * FROM gstat.ndv")
      .queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r
      }.getOrElse(fail("no v2 scan relation"))
    val gStat = rel.stats.attributeStats.collectFirst {
      case (a, cs) if a.name.equalsIgnoreCase("grp") => cs
    }.getOrElse(fail(s"no grp column stat in " +
      s"${rel.stats.attributeStats.keys}"))
    val ndv = gStat.distinctCount
      .getOrElse(fail("no distinctCount for grp")).toLong
    assert(ndv >= 3 && ndv <= 6, s"NDV(grp) should estimate ~4, got $ndv")

    // 2. the strategy flip: under CBO, GROUP BY grp is estimated at
    // NDV rows (tiny) and the aggregated side broadcasts; with CBO
    // off the estimate stays scan-sized and it must not. Planner-side
    // only: AQE's runtime-size conversion is pinned off so the flip
    // is attributable to the manifest NDV, nothing else.
    val bigPath = tmpDir("cstat-ndv-big")
    spark.range(100000).selectExpr("id % 4 AS g", "id AS x")
      .write.mode("overwrite").parquet(bigPath)
    spark.read.parquet(bigPath).createOrReplaceTempView("cstat_ndv_big")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def aggBroadcasts(): Boolean = {
        val q = sqlc("""SELECT count(*) AS n FROM cstat_ndv_big b
          JOIN (SELECT grp, count(*) AS c FROM gstat.ndv GROUP BY grp) d
          ON b.g = d.grp""")
        assert(q.as[Long].head() == 100000L)
        q.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin")
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      assert(aggBroadcasts(),
        "with CBO reading the manifest NDV, the 4-group aggregate " +
          "should broadcast")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(!aggBroadcasts(),
        "without CBO the aggregate estimate stays scan-sized — a " +
          "broadcast here means the threshold, not the NDV, decided")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      prevAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("a selective cluster-col filter shrinks planned bytes below " +
      "the broadcast threshold (r12)") {
    sqlc("""CREATE TABLE gstat.cl2 (
        id BIGINT, price DOUBLE, pad STRING, version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='8',
          'cluster_by'='price')""")
    sqlc("""INSERT INTO gstat.cl2
        SELECT id,
          CAST(pmod(xxhash64(id), 8) * 100 + id % 50 AS DOUBLE),
          repeat(uuid(), 4), 0L, false FROM range(4000)""")
    val bigPath = tmpDir("cstat-big2")
    spark.range(50000).selectExpr("id AS fid",
      "CAST(id % 800 AS DOUBLE) AS fprice")
      .write.mode("overwrite").parquet(bigPath)
    spark.read.parquet(bigPath).createOrReplaceTempView("cstat_big2")
    // total table bytes from the unfiltered scan's own estimate
    val total = sqlc("SELECT * FROM gstat.cl2")
      .queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.get.toLong
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (total / 2).toString)
    // pin the PLANNER's decision: AQE's runtime-size conversion would
    // broadcast the small shuffle either way, which is not what this
    // test measures (the manifest-pruned PLANNING bytes are)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // true iff the GRAFT side (the v2 batch scan) sits under a
      // broadcast exchange — the fact parquet side may broadcast on
      // its own merits, which is not what this test pins
      def graftBroadcast(q: org.apache.spark.sql.DataFrame): Boolean = {
        q.collect()
        def walk(pl: org.apache.spark.sql.execution.SparkPlan,
            underBcast: Boolean): Boolean = pl match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.executedPlan, underBcast)
          // AQE materializes exchanges as leaf query stages — descend
          // into the wrapped plan or the walk never sees the scan
          case qs: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => walk(qs.plan, underBcast)
          case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => underBcast
          case e: org.apache.spark.sql.execution.exchange
              .BroadcastExchangeExec =>
            walk(e.child, underBcast = true)
          case r: org.apache.spark.sql.execution.exchange
              .ReusedExchangeExec => walk(r.child, underBcast)
          case o => o.children.exists(walk(_, underBcast)) ||
            o.subqueries.exists(walk(_, underBcast))
        }
        walk(q.queryExecution.executedPlan, underBcast = false)
      }
      // unfiltered: 8 buckets of planned bytes > threshold → the
      // maintained side must NOT broadcast
      val unf = sqlc("""SELECT count(*) AS n FROM cstat_big2 b
        JOIN gstat.cl2 d ON b.fprice = d.price""")
      assert(!graftBroadcast(unf),
        "unfiltered maintained side should exceed the threshold")
      // cluster-range filter prunes to ~1/8 of the bytes → broadcasts
      val fil = sqlc("""SELECT count(*) AS n FROM cstat_big2 b
        JOIN (SELECT * FROM gstat.cl2
              WHERE price >= 200.0 AND price < 250.0) d
        ON b.fprice = d.price""")
      assert(graftBroadcast(fil),
        "the cluster-pruned side should fall under the threshold " +
          "and broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
