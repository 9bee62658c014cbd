package graft.cdc

import java.sql.Timestamp

import graft.SparkSpec

/** The LIVE-DATABASE source path ([[CdcEngine.jdbc]]) — the direct
  * analog of the reference reading Postgres
  * (`/root/reference/app/database.py:8-10`) — exercised against an
  * in-JVM Apache Derby database (on Spark's own classpath), the one
  * code path round 9 flagged as untested:
  *
  *  - full / incremental / delta exports over JDBC produce the SAME
  *    artifacts as the parquet-snapshot path on identical data;
  *  - the watermark predicate PUSHES DOWN into the remote SQL
  *    (`WHERE updated_at > ?` ships to the database — served there by
  *    the reference's `idx_users_updated_at` index — instead of
  *    filtering after a full table pull);
  *  - the watermark discipline holds across live mutations: strict
  *    `>`, advance to max(updated_at) of the exported batch only.
  */
class CdcJdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:cdcjdbc;create=true"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def ts(d: Int): String = f"2026-01-$d%02d 00:00:00"

  /** (Re)seed the Derby `users` table. Column names are QUOTED
    * lowercase so the JDBC schema matches [[Schemas.users]] casing
    * (Derby upcases unquoted identifiers).
    */
  private def seed(): Unit = withConn { c =>
    val st = c.createStatement()
    try st.execute("DROP TABLE users")
    catch { case _: java.sql.SQLException => () }
    st.execute("""CREATE TABLE users (
      "id" BIGINT NOT NULL, "name" VARCHAR(100), "email" VARCHAR(100),
      "created_at" TIMESTAMP, "updated_at" TIMESTAMP,
      "is_deleted" BOOLEAN)""")
    // ids 1..5 active (id=1 fresh insert: created==updated), id=6
    // soft-deleted; updated_at strictly increasing by id
    (1 to 6).foreach { i =>
      val created = if (i == 1) ts(i) else ts(1)
      st.execute(s"""INSERT INTO users VALUES ($i, 'u$i',
        'u$i@x.io', TIMESTAMP('$created'), TIMESTAMP('${ts(i)}'),
        ${if (i == 6) "true" else "false"})""")
    }
    st.close()
  }

  private def csvLines(outDir: String, filename: String): Seq[String] = {
    val p = java.nio.file.Paths.get(outDir, filename)
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
  }

  test("JDBC full/incremental/delta match the parquet-snapshot path " +
      "on identical data; the watermark predicate pushes down") {
    seed()
    val outJ = tmpDir("jdbc-out")
    val outP = tmpDir("pq-out")
    val jdbcEngine = CdcEngine.jdbc(spark, url, "users", props,
      tmpDir("jdbc-wm"), outJ)
    // parquet twin seeded from the SAME rows through the same JDBC
    // read, so any value difference is the engine path, never the data
    val snap = tmpDir("pq-snap")
    spark.read.jdbc(url, "users", props).write.mode("overwrite")
      .parquet(snap)
    val pqEngine = new CdcEngine(spark, snap, tmpDir("pq-wm"), outP)

    // --- full: soft-delete excluded, identical CSV bytes ---
    val fj = jdbcEngine.fullExport("c")
    val fp = pqEngine.fullExport("c")
    assert(fj.rowsExported == 5L && fp.rowsExported == 5L)
    assert(csvLines(outJ, fj.outputFilename) == csvLines(outP, fp.outputFilename),
      "JDBC and parquet full exports differ")
    // watermark advanced to max(updated_at) of the exported batch
    val wm = jdbcEngine.watermark("c").get
    assert(wm == Timestamp.valueOf(ts(5)), wm.toString)

    // --- the incremental predicate ships to the database ---
    val incPlan = Ops.incrementalChanges(
      spark.read.jdbc(url, "users", props), wm)
      .queryExecution.executedPlan.toString
    assert(incPlan.contains("PushedFilters:") &&
      incPlan.contains("GreaterThan(updated_at"),
      s"watermark predicate not pushed into the JDBC scan:\n$incPlan")

    // --- live mutations: strict >, deleted rows excluded ---
    withConn { c =>
      val st = c.createStatement()
      // row AT the watermark mutates in place (same updated_at):
      // strict > must never re-export it
      st.execute("UPDATE users SET \"name\" = 'silent' WHERE \"id\" = 5")
      st.execute(s"""UPDATE users SET "name" = 'u1x',
        "updated_at" = TIMESTAMP('${ts(7)}') WHERE "id" = 1""")
      st.execute(s"""INSERT INTO users VALUES (99, 'new', 'new@x.io',
        TIMESTAMP('${ts(8)}'), TIMESTAMP('${ts(8)}'), false)""")
      st.execute(s"""UPDATE users SET "is_deleted" = true,
        "updated_at" = TIMESTAMP('${ts(9)}') WHERE "id" = 2""")
      st.close()
    }
    val inc = jdbcEngine.incrementalExport("c")
    assert(inc.rowsExported == 2L, inc.toString) // id=1 update, id=99 insert
    val incIds = csvLines(outJ, inc.outputFilename).drop(1).map(_.split(",")(0))
    assert(incIds == Seq("1", "99"), incIds.toString)
    // incremental advanced only to ITS batch's max (ts 8): the deleted
    // row at ts(9) was not part of the incremental batch
    assert(jdbcEngine.watermark("c").get == Timestamp.valueOf(ts(8)))

    // --- delta: soft-delete included and tagged ---
    val del = jdbcEngine.deltaExport("c")
    assert(del.rowsExported == 1L, del.toString)
    val line = csvLines(outJ, del.outputFilename).drop(1).head
    assert(line.startsWith("DELETE,2,"), line)
  }

  test("incremental without a watermark exports nothing and writes " +
      "no file (JDBC source)") {
    seed()
    val out = tmpDir("jdbc-out2")
    val engine = CdcEngine.jdbc(spark, url, "users", props,
      tmpDir("jdbc-wm2"), out)
    val job = engine.incrementalExport("fresh")
    assert(job.rowsExported == 0L && job.outputFilename.isEmpty)
    assert(new java.io.File(out).listFiles() == null ||
      new java.io.File(out).listFiles().isEmpty)
    assert(engine.watermark("fresh").isEmpty)
  }
}
