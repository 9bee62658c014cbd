package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{Compaction, TxLog}

/** ALTER TABLE as metadata-only commits: ADD COLUMN null-extends
  * pre-ALTER files on read, RENAME COLUMN is a versioned mapping the
  * read funnels resolve per generation directory (old files keep old
  * names; post-rename nulls STAY null — no coalesce semantics), DROP
  * COLUMN stops projecting and fences the name against resurrection,
  * table-parameter columns are immutable, concurrent writers race the
  * same manifest CAS, and time travel serves each commit's own schema.
  */
class AlterTableSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-alter-wh")
    spark.conf.set("spark.sql.catalog.galter",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.galter.warehouse", w)
    w
  }

  private def sqlc(q: String) = { warehouse; spark.sql(q) }

  private def mk(name: String, rows: Int): String = {
    sqlc(s"""CREATE TABLE galter.$name (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc(s"""INSERT INTO galter.$name
        SELECT id, concat('u', id), 0L, false FROM range($rows)""")
    s"$warehouse/$name"
  }

  test("ADD COLUMN: metadata-only, null-extended reads, DML on evolved schema") {
    val dir = mk("t_add", 50)
    val v0 = Compaction.version(spark, dir)
    sqlc("ALTER TABLE galter.t_add ADD COLUMN score DOUBLE")
    // exactly one commit, no data rewrite (bucket rels unchanged)
    assert(Compaction.version(spark, dir) == v0 + 1)
    assert(TxLog.latest(spark, dir).get.buckets ==
      TxLog.read(spark, dir, v0).buckets)
    val got = sqlc("SELECT id, score FROM galter.t_add WHERE id = 7")
      .as[(Long, Option[Double])].head()
    assert(got == (7L -> None)) // pre-ALTER files null-extend
    // DML writes through the evolved schema
    sqlc("INSERT INTO galter.t_add SELECT 7L, 'seven', 1L, false, 9.5D")
    assert(sqlc("SELECT score FROM galter.t_add WHERE id = 7")
      .as[Option[Double]].head().contains(9.5))
    assert(sqlc("SELECT count(*) AS n FROM galter.t_add")
      .as[Long].head() == 50L)
    // adding an existing name fails (Spark's analyzer catches the
    // live-name collision before our fence does)
    val e = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_add ADD COLUMN name STRING")
    }
    assert(e.getMessage.contains("in use") ||
      e.getMessage.contains("FIELD_ALREADY_EXISTS"))
  }

  test("RENAME COLUMN: old generations resolve, explicit nulls stay null") {
    val dir = mk("t_ren", 40)
    sqlc("ALTER TABLE galter.t_ren RENAME COLUMN name TO label")
    assert(sqlc("SELECT * FROM galter.t_ren").columns.toSeq ==
      Seq("id", "label", "version", "deleted"))
    // pre-rename data is visible under the new name
    assert(sqlc("SELECT label FROM galter.t_ren WHERE id = 3")
      .as[String].head() == "u3")
    // post-rename write with an EXPLICIT NULL must stay null (the
    // trap a coalesce-based mapping would get wrong)
    sqlc("INSERT INTO galter.t_ren SELECT 3L, CAST(NULL AS STRING), 1L, false")
    assert(sqlc("SELECT label FROM galter.t_ren WHERE id = 3")
      .as[Option[String]].head().isEmpty)
    // untouched pre-rename rows still serve old bytes
    assert(sqlc("SELECT label FROM galter.t_ren WHERE id = 5")
      .as[String].head() == "u5")
    // filter on the renamed column answers over both epochs
    assert(sqlc("SELECT count(*) AS n FROM galter.t_ren " +
      "WHERE label LIKE 'u%'").as[Long].head() == 39L)
    // chained rename keeps resolving through both events
    sqlc("ALTER TABLE galter.t_ren RENAME COLUMN label TO title")
    assert(sqlc("SELECT title FROM galter.t_ren WHERE id = 5")
      .as[String].head() == "u5")
    // reusing a historical spelling is fenced (files still carry it)
    val e = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_ren ADD COLUMN name STRING")
    }
    assert(e.getMessage.contains("in use"))
    // merge-time evolution is fenced the same way
    val e2 = intercept[Exception] {
      Compaction.merge(spark, dir,
        Seq((1L, "x", 2L, false, "smuggled"))
          .toDF("id", "title", "version", "deleted", "label"))
    }
    assert(e2.getMessage.contains("pre-rename"))
  }

  test("RENAME COLUMN survives later merges and compaction") {
    val dir = mk("t_renm", 30)
    sqlc("ALTER TABLE galter.t_renm RENAME COLUMN name TO label")
    sqlc("INSERT INTO galter.t_renm SELECT 1L, 'post', 1L, false")
    // rename props carry across the merge commit
    assert(sqlc("SELECT label FROM galter.t_renm WHERE id = 2")
      .as[String].head() == "u2")
    // merge-on-read + fold across epochs
    Compaction.merge(spark, dir,
      Seq((2L, "mor", 2L, false)).toDF("id", "label", "version", "deleted"),
      mergeOnRead = true)
    assert(sqlc("SELECT label FROM galter.t_renm WHERE id = 2")
      .as[String].head() == "mor")
    assert(sqlc("SELECT label FROM galter.t_renm WHERE id = 9")
      .as[String].head() == "u9")
    Compaction.compact(spark, dir)
    assert(sqlc("SELECT label FROM galter.t_renm WHERE id = 9")
      .as[String].head() == "u9")
    assert(sqlc("SELECT count(*) AS n FROM galter.t_renm")
      .as[Long].head() == 30L)
  }

  test("DROP COLUMN: stops projecting, fences resurrection") {
    val dir = mk("t_drop", 20)
    sqlc("ALTER TABLE galter.t_drop DROP COLUMN name")
    assert(sqlc("SELECT * FROM galter.t_drop").columns.toSeq ==
      Seq("id", "version", "deleted"))
    assert(sqlc("SELECT count(*) AS n FROM galter.t_drop")
      .as[Long].head() == 20L)
    // re-adding the dropped name is fenced: old files still carry it
    val e = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_drop ADD COLUMN name STRING")
    }
    assert(e.getMessage.contains("in use"))
    // ...and so is smuggling it back through merge evolution
    val e2 = intercept[Exception] {
      Compaction.merge(spark, dir,
        Seq((1L, 1L, false, "zombie"))
          .toDF("id", "version", "deleted", "name"))
    }
    assert(e2.getMessage.contains("dropped"))
  }

  test("table-parameter columns are immutable") {
    mk("t_prot", 5)
    for (bad <- Seq(
        "ALTER TABLE galter.t_prot DROP COLUMN id",
        "ALTER TABLE galter.t_prot DROP COLUMN version",
        "ALTER TABLE galter.t_prot RENAME COLUMN id TO uid",
        "ALTER TABLE galter.t_prot RENAME COLUMN deleted TO gone")) {
      val e = intercept[Exception] { sqlc(bad) }
      assert(e.getMessage.contains("parameter"), s"$bad: ${e.getMessage}")
    }
  }

  test("time travel serves each commit's own schema") {
    val dir = mk("t_tt", 10)
    val v0 = Compaction.version(spark, dir)
    sqlc("ALTER TABLE galter.t_tt ADD COLUMN extra BIGINT")
    sqlc("ALTER TABLE galter.t_tt RENAME COLUMN name TO label")
    assert(sqlc(s"SELECT * FROM galter.t_tt VERSION AS OF $v0")
      .columns.toSeq == Seq("id", "name", "version", "deleted"))
    assert(sqlc(s"SELECT name FROM galter.t_tt VERSION AS OF $v0 " +
      "WHERE id = 4").as[String].head() == "u4")
    assert(sqlc("SELECT * FROM galter.t_tt").columns.toSeq ==
      Seq("id", "label", "version", "deleted", "extra"))
    assert(dir.nonEmpty)
  }

  test("concurrent ALTER and merge: OCC serializes, nothing lost") {
    val dir = mk("t_occ", 100)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val alter = Future {
      Compaction.alterSchema(spark, dir, Seq(
        Compaction.SchemaChange.AddColumn("score",
          org.apache.spark.sql.types.DoubleType)))
    }
    val merge = Future {
      Compaction.merge(spark, dir,
        Seq((200L, "new", 1L, false))
          .toDF("id", "name", "version", "deleted"),
        retainHistory = true)
    }
    Await.result(alter, 60.seconds)
    Await.result(merge, 60.seconds)
    pool.shutdown()
    // both effects landed regardless of commit order
    assert(sqlc("SELECT count(*) AS n FROM galter.t_occ")
      .as[Long].head() == 101L)
    assert(sqlc("SELECT * FROM galter.t_occ").columns.contains("score"))
  }

  test("ALTER COLUMN TYPE widens metadata-only; old narrow files read wide") {
    sqlc("""CREATE TABLE galter.t_widen (
        id BIGINT, qty INT, price FLOAT, version BIGINT,
        deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("""INSERT INTO galter.t_widen
        SELECT id, CAST(id AS INT), CAST(id AS FLOAT) / 2, 0L, false
        FROM range(50)""")
    val dir = s"$warehouse/t_widen"
    val v0 = Compaction.version(spark, dir)
    sqlc("ALTER TABLE galter.t_widen ALTER COLUMN qty TYPE BIGINT")
    sqlc("ALTER TABLE galter.t_widen ALTER COLUMN price TYPE DOUBLE")
    // metadata-only: no bucket directory moved
    assert(TxLog.latest(spark, dir).get.buckets ==
      TxLog.read(spark, dir, v0).buckets)
    val row = sqlc(
      "SELECT qty, price FROM galter.t_widen WHERE id = 7").head()
    assert(row.getLong(0) == 7L, "INT file bytes must read as BIGINT")
    assert(math.abs(row.getDouble(1) - 3.5) < 1e-9,
      "FLOAT file bytes must read as DOUBLE")
    assert(sqlc("SELECT sum(qty) AS s FROM galter.t_widen")
      .as[Long].head() == (0L until 50L).sum)
  }

  test("merge after widening: wide changelog upserts over narrow files") {
    sqlc("""CREATE TABLE galter.t_widen2 (
        id BIGINT, qty INT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    sqlc("""INSERT INTO galter.t_widen2
        SELECT id, CAST(1 AS INT), 0L, false FROM range(20)""")
    sqlc("ALTER TABLE galter.t_widen2 ALTER COLUMN qty TYPE BIGINT")
    // a post-widen merge writes values only a BIGINT can hold
    sqlc("""INSERT INTO galter.t_widen2 VALUES
        (3, 9000000000, 1, false), (50, 8000000000, 1, false)""")
    val got = sqlc("SELECT id, qty FROM galter.t_widen2 " +
      "WHERE id IN (3, 4, 50)")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 9000000000L, 4L -> 1L, 50L -> 8000000000L))
    assert(sqlc("SELECT count(*) AS n FROM galter.t_widen2")
      .as[Long].head() == 21L)
  }

  test("merge-on-read fold across width epochs") {
    val dir = tmpDir("widen-mor") + "/t"
    Compaction.init(
      (0L until 16L).map(i => (i, i.toInt, 0L, false))
        .toDF("id", "qty", "version", "deleted"),
      dir, "id", "version", "deleted", 4)
    Compaction.alterSchema(spark, dir, Seq(
      Compaction.SchemaChange.WidenColumn("qty",
        org.apache.spark.sql.types.LongType)))
    // MoR delta carries BIGINT values over the INT base files: the
    // fold reads both epochs under the wide type
    Compaction.merge(spark, dir,
      Seq((5L, 7000000000L, 1L, false), (99L, 6000000000L, 1L, false))
        .toDF("id", "qty", "version", "deleted"),
      mergeOnRead = true)
    val viaEngine = Compaction.read(spark, dir)
      .select("id", "qty").as[(Long, Long)].collect().toMap
    assert(viaEngine(5L) == 7000000000L && viaEngine(99L) == 6000000000L)
    assert(viaEngine(4L) == 4L)
    assert(viaEngine.size == 17)
    // the catalog's in-reader fold agrees
    sqlc(s"""CREATE TABLE galter.t_widen_mor (
        id BIGINT, qty BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')
        LOCATION '$dir'""")
    val viaSql = sqlc("SELECT id, qty FROM galter.t_widen_mor")
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaEngine,
      "catalog MoR fold disagrees with the engine across width epochs")
    // compaction folds the epochs away and the answer holds
    Compaction.compact(spark, dir)
    assert(Compaction.read(spark, dir).select("id", "qty")
      .as[(Long, Long)].collect().toMap == viaEngine)
  }

  test("widening refuses narrowing, key columns, and the tombstone") {
    sqlc("""CREATE TABLE galter.t_widen3 (
        id BIGINT, qty BIGINT, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    // Spark's analyzer already rejects the lossy direction (canUpCast
    // fails) before the catalog sees it; our own fence backs it up
    // for programmatic alterSchema callers
    val narrowing = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_widen3 ALTER COLUMN qty TYPE INT")
    }
    assert(narrowing.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      narrowing.getMessage.contains("cannot change"))
    val narrowingApi = intercept[Exception] {
      Compaction.alterSchema(spark, s"$warehouse/t_widen3", Seq(
        Compaction.SchemaChange.WidenColumn("qty",
          org.apache.spark.sql.types.IntegerType)))
    }
    assert(narrowingApi.getMessage.contains("cannot change"))
    val key = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_widen3 ALTER COLUMN id TYPE DECIMAL(38,0)")
    }
    assert(key.getMessage.contains("key") ||
      key.getMessage.contains("hash"))
    val tomb = intercept[Exception] {
      sqlc("ALTER TABLE galter.t_widen3 ALTER COLUMN deleted TYPE STRING")
    }
    assert(tomb.getMessage.toLowerCase.contains("boolean") ||
      tomb.getMessage.contains("cannot change"))
  }
}
