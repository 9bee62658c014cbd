package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction

/** SQL front door for maintained tables: MERGE INTO / UPDATE / DELETE
  * over a registered name lower onto ONE Compaction.merge batch, and
  * the registered view refreshes so a follow-up SELECT sees the new
  * committed state.
  */
class GraftDmlSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(tag: String): (String, String) = {
    val dir = tmpDir(s"dml-$tag") + "/t"
    val name = s"dml_$tag"
    Compaction.init(
      spark.range(100).select(col("id"),
        concat(lit("u"), col("id")).as("name"),
        lit(0L).as("version"), lit(false).as("deleted")),
      dir, "id", "version", "deleted", nBuckets = 8)
    GraftTables.register(spark, name, dir)
    (dir, name)
  }

  test("MERGE INTO: upsert + conditional delete from a SQL string") {
    val (_, name) = freshTable("merge")
    Seq((7L, "seven2", 1L, false),
      (200L, "new", 1L, false),
      (9L, "", 1L, true))
      .toDF("id", "name", "version", "deleted")
      .createOrReplaceTempView("dml_changes")

    GraftTables.sql(spark,
      s"""MERGE INTO $name USING dml_changes ON $name.id = dml_changes.id
         |WHEN MATCHED AND dml_changes.deleted THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    // the registered view refreshed: plain SELECT sees the merge
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 100)            // -1 delete +1 insert
    assert(got(7L) == "seven2")
    assert(got(200L) == "new")
    assert(!got.contains(9L))
  }

  test("MERGE INTO with a composite key equates every key column") {
    val dir = tmpDir("dml-ck") + "/t"
    Compaction.init(
      Seq(("t1", 1L, "a", 0L, false), ("t2", 1L, "b", 0L, false))
        .toDF("tenant", "id", "payload", "version", "deleted"),
      dir, Seq("tenant", "id"), "version", "deleted", nBuckets = 4)
    GraftTables.register(spark, "dml_ck", dir)
    Seq(("t1", 1L, "a2", 1L, false))
      .toDF("tenant", "id", "payload", "version", "deleted")
      .createOrReplaceTempView("dml_ck_src")

    GraftTables.sql(spark,
      """MERGE INTO dml_ck USING dml_ck_src
        |ON dml_ck.tenant = dml_ck_src.tenant AND dml_ck.id = dml_ck_src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table("dml_ck").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("t1", 1L, "a2"), ("t2", 1L, "b")))

    // an ON that misses a key column is rejected, not silently wrong
    val e = intercept[Exception] {
      GraftTables.sql(spark,
        """MERGE INTO dml_ck USING dml_ck_src ON dml_ck.id = dml_ck_src.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("equate exactly the merge key"),
      s"wrong error: ${e.getMessage}")
  }

  test("UPDATE and DELETE lower to tombstone/upsert merges") {
    val (dir, name) = freshTable("upd")
    GraftTables.sql(spark,
      s"UPDATE $name SET name = concat(name, '!') WHERE id < 3")
    GraftTables.sql(spark, s"DELETE FROM $name WHERE id >= 90")
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 90)
    assert(got(0L) == "u0!" && got(2L) == "u2!" && got(3L) == "u3")
    assert(!got.contains(95L))
    // the merges were real commits: a fresh read off the dir agrees
    assert(Compaction.countRows(spark, dir) == 90L)
  }

  test("delete-only MERGE (no update/insert) marks matched rows") {
    val (_, name) = freshTable("delonly")
    spark.range(5).select(col("id"), lit("x").as("name"),
        lit(1L).as("version"), lit(false).as("deleted"))
      .createOrReplaceTempView("dml_del_src")
    GraftTables.sql(spark,
      s"""MERGE INTO $name USING dml_del_src ON $name.id = dml_del_src.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table(name).count() == 95)
  }

  test("INSERT INTO ... SELECT lowers to an upsert merge") {
    val (dir, name) = freshTable("ins")
    GraftTables.sql(spark,
      s"""INSERT INTO $name
         |SELECT id + 500, concat('ins', id), 1L, false
         |FROM range(3)""".stripMargin)
    // an insert of an EXISTING key upserts by version (ON CONFLICT)
    GraftTables.sql(spark,
      s"INSERT INTO $name SELECT 7L, 'up7', 2L, false")
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 103)
    assert(got(500L) == "ins0" && got(502L) == "ins2")
    assert(got(7L) == "up7")
    assert(Compaction.countRows(spark, dir) == 103L)
  }

  test("unsupported shapes fail with a clear message") {
    val (_, name) = freshTable("unsup")
    spark.range(1).select(col("id"), lit("x").as("name"),
        lit(1L).as("version"), lit(false).as("deleted"))
      .createOrReplaceTempView("dml_unsup_src")
    val e = intercept[Exception] {
      GraftTables.sql(spark,
        s"""MERGE INTO $name USING dml_unsup_src
           |ON $name.id = dml_unsup_src.id
           |WHEN MATCHED THEN UPDATE SET name = 'y'""".stripMargin)
    }
    assert(e.getMessage.contains("UPDATE SET *") ||
      e.getMessage.contains("unsupported"), s"wrong error: ${e.getMessage}")
    // non-DML SQL passes straight through to spark.sql
    assert(GraftTables.sql(spark,
      s"SELECT count(*) AS n FROM $name").as[Long].head() == 100L)
    // UPDATE may not rewrite key/engine columns (a key change would
    // duplicate, not move; a version change would corrupt the merge)
    val eKey = intercept[Exception] {
      GraftTables.sql(spark, s"UPDATE $name SET id = id + 1 WHERE id = 1")
    }
    assert(eKey.getMessage.contains("merge key"), eKey.getMessage)
    val eVer = intercept[Exception] {
      GraftTables.sql(spark, s"UPDATE $name SET version = 99 WHERE id = 1")
    }
    assert(eVer.getMessage.contains("engine column"), eVer.getMessage)
  }

  private def twoColTable(tag: String): (String, String) = {
    val dir = tmpDir(s"dml-$tag") + "/t"
    val name = s"dml_$tag"
    Compaction.init(
      spark.range(10).select(col("id"),
        (col("id") * 10).as("a"), (col("id") * 100).as("b"),
        lit(0L).as("version"), lit(false).as("deleted")),
      dir, "id", "version", "deleted", nBuckets = 4)
    GraftTables.register(spark, name, dir)
    (dir, name)
  }

  test("multi-assignment UPDATE evaluates every RHS on the PRE-update row") {
    val (_, name) = twoColTable("swap")
    // SQL semantics: SET a = b, b = a SWAPS (both RHS see pre-images);
    // a sequential withColumn lowering would leave b unchanged
    GraftTables.sql(spark, s"UPDATE $name SET a = b, b = a WHERE id = 3")
    val r = spark.table(name).filter(col("id") === 3)
      .select("a", "b").as[(Long, Long)].head()
    assert(r == ((300L, 30L)), s"expected swap (300,30), got $r")
    // untouched rows intact
    val r2 = spark.table(name).filter(col("id") === 4)
      .select("a", "b").as[(Long, Long)].head()
    assert(r2 == ((40L, 400L)))
  }

  test("UPDATE SET of the same column twice is rejected") {
    val (_, name) = twoColTable("dup")
    val e = intercept[Exception] {
      GraftTables.sql(spark, s"UPDATE $name SET a = 1, a = 2 WHERE id = 1")
    }
    assert(e.getMessage.contains("twice"), e.getMessage)
  }

  test("UPDATE rebuilds on a concurrent commit instead of losing it") {
    val (dir, name) = twoColTable("race")
    val interleaved = new java.util.concurrent.atomic.AtomicInteger(0)
    // deterministic interleaving: the FIRST derive triggers a
    // concurrent writer committing AFTER our snapshot read — the
    // pinned-base merge must abort (StaleBase), and the retry must
    // re-derive from the new snapshot so BOTH writes land
    GraftDml.rmwLoop(spark, dir, name) { current =>
      if (interleaved.getAndIncrement() == 0) {
        Compaction.merge(spark, dir,
          spark.range(1).select(lit(5L).as("id"), lit(-1L).as("a"),
            lit(-2L).as("b"), lit(1L).as("version"),
            lit(false).as("deleted")))
      }
      // the statement: SET a = a + 1000 WHERE id = 5 — derived from
      // whatever snapshot `current` resolves
      current.filter(col("id") === 5)
        .withColumn("a", col("a") + 1000)
    }
    assert(interleaved.get() == 2,
      s"expected a StaleBase retry (2 derives), got ${interleaved.get()}")
    val r = Compaction.read(spark, dir).filter(col("id") === 5)
      .select("a", "b").as[(Long, Long)].head()
    // the concurrent write (a=-1, b=-2) was seen by the retry: the
    // update applied ON TOP of it, not over the stale pre-image
    assert(r == ((999L, -2L)), s"lost update: got $r")
  }
}
