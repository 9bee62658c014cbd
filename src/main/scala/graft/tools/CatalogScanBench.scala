package graft.tools

import org.apache.spark.sql.functions._

/** Microbench for the catalog read path: full-table SELECT + wide
  * aggregate through (a) the native DSv2 Batch scan (vectorized
  * parquet, columnar hand-off) and (b) the former `V1Scan` bridge's
  * shape — the engine read funneled through `RDD[Row]` with
  * `needConversion = true` (re-created here verbatim so the
  * comparison survives the bridge's removal). Run:
  *
  * {{{ sbt "runMain graft.tools.CatalogScanBench [nRows]" }}}
  */
object CatalogScanBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = graft.GraftSession.get("graft-catalog-scan-bench")
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-scanbench-wh").toString
    spark.conf.set("spark.sql.catalog.gbench",
      "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbench.warehouse", wh)
    spark.sql("""CREATE TABLE gbench.t (
      id BIGINT, a DOUBLE, b DOUBLE, s STRING, version BIGINT,
      deleted BOOLEAN) TBLPROPERTIES ('keys'='id', 'buckets'='32')""")
    spark.range(n).select(col("id"),
        (col("id") % 997).cast("double").as("a"),
        (col("id") % 31).cast("double").as("b"),
        concat(lit("row-"), col("id")).as("s"),
        lit(0L).as("version"), lit(false).as("deleted"))
      .createOrReplaceTempView("scanbench_src")
    spark.sql("INSERT INTO gbench.t SELECT * FROM scanbench_src")

    def time(what: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = body
        println(f"SCANBENCH $what run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    }

    // the native path: catalog SELECT -> GraftScan (columnar)
    time("native-batch") {
      spark.table("gbench.t")
        .agg(sum("a"), sum("b"), count(lit(1))).as[(Double, Double, Long)]
        .head()._3
    }
    // the former V1 bridge's shape: same engine read, but emitted as
    // RDD[Row] and re-converted (needConversion) — what every catalog
    // SELECT paid before round 8
    val dir = s"$wh/t"
    time("v1-bridge-shape") {
      val base = graft.cdc.Compaction.read(spark, dir)
      spark.createDataFrame(base.rdd, base.schema)
        .agg(sum("a"), sum("b"), count(lit(1))).as[(Double, Double, Long)]
        .head()._3
    }
    spark.stop()
  }
}
