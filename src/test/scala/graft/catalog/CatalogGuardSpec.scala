package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{Compaction, Scd2}
import graft.plans.GraftTables

/** Catalog attachment and DML guards: a CREATE ... LOCATION whose
  * declared DDL disagrees with the existing table's metadata fails
  * (nothing is silently ignored), and name-based DML/maintenance on a
  * non-merge (Scd2/AggView) dir under the warehouse fails loudly
  * instead of stamping merge semantics over a history table.
  */
class CatalogGuardSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-guard-wh")
    spark.conf.set("spark.sql.catalog.gguard",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gguard.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def freshTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    val df = Seq((1L, "a", 0L, false), (2L, "b", 0L, false))
      .toDF("id", "name", "ver", "gone")
    Compaction.init(df, dir, Seq("id"), "ver", "gone", 4, Nil)
    dir
  }

  test("LOCATION attach validates declared version_col/delete_col/buckets") {
    val dir = freshTable("guard-attach")
    // wrong version_col
    val e1 = intercept[Exception] {
      sqlc(s"""CREATE TABLE gguard.bad1 (id BIGINT, name STRING,
          ver BIGINT, gone BOOLEAN)
          TBLPROPERTIES ('keys'='id', 'version_col'='version')
          LOCATION '$dir'""")
    }
    assert(e1.getMessage.contains("version_col"))
    assert(!sqlc("SHOW TABLES IN gguard").collect()
      .map(_.getString(1)).contains("bad1"))
    // wrong bucket count
    val e2 = intercept[Exception] {
      sqlc(s"""CREATE TABLE gguard.bad2 (id BIGINT, name STRING,
          ver BIGINT, gone BOOLEAN)
          TBLPROPERTIES ('keys'='id', 'buckets'='99')
          LOCATION '$dir'""")
    }
    assert(e2.getMessage.contains("buckets"))
    // wrong declared schema (name mismatch)
    val e3 = intercept[Exception] {
      sqlc(s"""CREATE TABLE gguard.bad3 (id BIGINT, nom STRING,
          ver BIGINT, gone BOOLEAN)
          TBLPROPERTIES ('keys'='id')
          LOCATION '$dir'""")
    }
    assert(e3.getMessage.contains("schema"))
    // agreeing DDL attaches fine (undeclared props inherit)
    sqlc(s"""CREATE TABLE gguard.good (id BIGINT, name STRING,
        ver BIGINT, gone BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'version_col'='ver',
          'delete_col'='gone', 'buckets'='4')
        LOCATION '$dir'""")
    assert(sqlc("SELECT count(*) AS n FROM gguard.good")
      .as[Long].head() == 2L)
  }

  test("maintenance/DML on an Scd2 dir resolved by catalog name fails loudly") {
    warehouse
    val dir = s"$warehouse/hist"
    val changes = Seq((1L, "a", 0L, false), (1L, "a2", 1L, false))
      .toDF("id", "name", "ver", "gone")
    Scd2.init(changes, dir, "id", "ver", "gone", 4)
    val e = intercept[Exception] {
      GraftTables.sql(spark, "VACUUM gguard.hist")
    }
    assert(e.getMessage.contains("scd2"))
    val e2 = intercept[Exception] {
      GraftTables.sql(spark,
        "UPDATE gguard.hist SET name = 'x' WHERE id = 1")
    }
    assert(e2.getMessage.contains("scd2"))
  }
}
