package graft.queries

import graft.{SparkSpec, Tables}

/** The engine's SQL-text surface: the same analytics express as plain
  * `spark.sql` over registered views and return identical results to
  * the DataFrame formulations — a user can drive this library entirely
  * from SQL (native kernels included, via GraftExtensions).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("TPC-H Q1 shape in pure SQL matches the DataFrame plan") {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_sql")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem_sql
        |WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3)))
    val df = RelationalQueries.queries("q1_pricing_summary")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("sum_qty"), r.getAs[Long]("count_order")))
    assert(sql.toSeq == df.toSeq)
  }

  test("text pipeline expressions compose in SQL too") {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_sql")
    graft.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT doc_id,
        |  size(split(text, ' ')) AS n_tokens,
        |  md5(lower(trim(text))) AS fp,
        |  rolling_fp(text, 8, 16) IS NOT NULL AS has_fp,
        |  simhash64(transform(split(text, ' '), t -> xxhash64(t))) AS sh
        |FROM docs_sql ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.map(_.getLong(4)).distinct.length > 1)
  }
}
