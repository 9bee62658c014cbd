package graft.tools

import org.apache.spark.sql.functions._

/** Micro-floor for the staged bucket write every commit pays: scan the
  * orders table, bucket it, repartition+sort+write partitionBy(bucket)
  * — the exact mergeTail/init shape — three times, timed. Separates
  * "the write job itself costs X" from the protocol around it.
  */
object WriteFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-write-floor")
    val base = sys.props("java.io.tmpdir") + "/graft-write-floor"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WRITEFLOOR $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val src = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("id"),
        col("o_totalprice").cast("double").as("price"),
        lit(0L).as("version"), lit(false).as("deleted"))
    t("count(src)")(println(s"rows=${src.count()}"))
    (1 to 3).foreach { i =>
      t(s"write16 run$i") {
        src.withColumn("bucket", pmod(hash(col("id")), lit(16)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
          .write.partitionBy("bucket").mode("overwrite")
          .parquet(s"$base/w$i")
      }
      t(s"write16n run$i") {
        src.withColumn("bucket", pmod(hash(col("id")), lit(16)))
          .repartition(16, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
          .write.partitionBy("bucket").mode("overwrite")
          .parquet(s"$base/n$i")
      }
      t(s"plainwrite run$i") {
        src.write.mode("overwrite").parquet(s"$base/p$i")
      }
    }
    spark.stop()
  }
}
