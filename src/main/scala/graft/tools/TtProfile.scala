package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phase timer for the cdc_time_travel query shape (regression
  * diagnosis; see PLANS.md).
  */
object TtProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.get("graft-ttprof")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TTPROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      val dec18 = (c: Column) => c.cast("decimal(18,2)")
      val ord = graft.Tables.orders(s, sfDir)
      val snapshot = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("price"),
          lit(0L).as("version"), lit(false).as("deleted"))
      val changesA = ord.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("id"),
          (dec18(col("o_totalprice")) * lit(2).cast("decimal(18,2)"))
            .cast("double").as("price"),
          lit(1L).as("version"), (col("o_orderkey") % 5 === 0).as("deleted"))
      val changesB = ord.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("id"),
          (dec18(col("o_totalprice")) * lit(3).cast("decimal(18,2)"))
            .cast("double").as("price"),
          lit(2L).as("version"), lit(false).as("deleted"))
      val dir = sys.props("java.io.tmpdir") + s"/graft-ttprof-$round"
      println(s"TTPROF === round $round ===")
      t("init") { graft.cdc.Compaction.init(snapshot, dir,
        key = "id", versionCol = "version", deleteCol = "deleted",
        nBuckets = 16) }
      t("mergeA") { graft.cdc.Compaction.merge(s, dir, changesA,
        retainHistory = true) }
      t("mergeB") { graft.cdc.Compaction.merge(s, dir, changesB,
        retainHistory = true) }
      def summary(df: DataFrame, v: Int) =
        df.groupBy().agg(count(lit(1)).as("n_keys"),
            sum(dec18(col("price"))).cast("double").as("total"))
          .select(lit(v).as("v"), col("n_keys"), col("total"))
      t("readAsOf x3 + agg") {
        summary(graft.cdc.Compaction.readAsOf(s, dir, 0L), 0)
          .unionByName(summary(graft.cdc.Compaction.readAsOf(s, dir, 1L), 1))
          .unionByName(summary(graft.cdc.Compaction.readAsOf(s, dir, 2L), 2))
          .orderBy(col("v")).collect()
      }
      // merge constituents, approximated standalone
      val cached = t("m: bucket+persist+distinct") {
        val c = changesA
          .withColumn("bucket", pmod(xxhash64(col("id")), lit(16)).cast("int"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.select(col("bucket")).distinct().collect()
        c
      }
      t("m: union+window+write") {
        import org.apache.spark.sql.expressions.Window
        val snap = graft.cdc.Compaction.read(s, dir)
          .withColumn("bucket", pmod(xxhash64(col("id")), lit(16)).cast("int"))
          .withColumn("_src", lit(0))
        val un = snap.unionByName(cached.withColumn("_src", lit(1)))
        val w = Window.partitionBy(col("id"))
          .orderBy(col("version").desc, col("_src").desc)
        un.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1 && !col("deleted"))
          .drop("_rn", "_src")
          .repartition(col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
          .write.partitionBy("bucket").mode("overwrite")
          .parquet(sys.props("java.io.tmpdir") + s"/graft-ttprof-w-$round")
      }
      t("m: footer stats read") {
        s.read.parquet(sys.props("java.io.tmpdir") + s"/graft-ttprof-w-$round")
          .groupBy(col("bucket"))
          .agg(count(lit(1)), min(col("version")).cast("string"),
            max(col("version")).cast("string")).collect()
      }
      cached.unpersist()
    }
    s.stop()
  }
}
