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
}
