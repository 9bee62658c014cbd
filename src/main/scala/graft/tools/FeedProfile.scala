package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Step-level profiler for the feed-apply / replication protocol
  * chains (`cdc_feed_ivm`, `cdc_replica_sync`): runs each chain twice
  * at SPARK_GRAFT_SF_DIR, timing every protocol step separately so a
  * regression pins to its phase (init, merge+feed, feed read, apply /
  * clone, sync) instead of a whole-query number.
  */
object FeedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.get("graft-feed-profile")
    val dec18 = (c: Column) => c.cast("decimal(18,2)")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FEEDPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"FEEDPROF ===== round $round =====")
      val ord = graft.Tables.orders(s, sfDir)
      val snapshot = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("id"),
          col("o_totalprice").as("price"),
          lit(0L).as("version"), lit(false).as("deleted"))
      val changes = ord.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("id"),
          (dec18(col("o_totalprice")) * lit(2).cast("decimal(18,2)"))
            .cast("double").as("price"),
          lit(1L).as("version"),
          (col("o_orderkey") % 5 === 0).as("deleted"))

      // ---- cdc_feed_ivm chain ----
      val base = s"/tmp/graft-feedprof-$round"
      val tableDir = s"$base/table"
      val viewDir = s"$base/view"
      t("ivm.init.table") {
        graft.cdc.Compaction.init(snapshot, tableDir,
          key = "id", versionCol = "version", deleteCol = "deleted",
          nBuckets = 16)
      }
      t("ivm.init.view") {
        graft.cdc.AggView.init(
          snapshot.select((col("id") % 50).as("grp"), col("price")),
          viewDir, "grp", "price", nBuckets = 16)
      }
      t("ivm.merge+feed") {
        graft.cdc.Compaction.merge(s, tableDir, changes, emitFeed = true)
      }
      val feed = t("ivm.readFeed(plan)") {
        graft.cdc.Compaction.readFeed(s, tableDir)
          .withColumn("grp", col("id") % 50)
      }
      t("ivm.applyFeed") {
        graft.cdc.AggView.applyFeed(s, viewDir, feed, batchId = 0L)
      }
      t("ivm.read+agg") {
        graft.cdc.AggView.read(s, viewDir)
          .select(col("grp"), col("cnt"),
            col("total").cast("double").as("total"))
          .orderBy(col("grp")).count()
      }

      // ---- cdc_replica_sync chain ----
      def batch(mod: Int, v: Long) = ord.filter(col("o_orderkey") % mod === 0)
        .select(col("o_orderkey").as("id"),
          (dec18(col("o_totalprice")) * lit(v + 1).cast("decimal(18,2)"))
            .cast("double").as("price"),
          lit(v).as("version"),
          (col("o_orderkey") % 5 === 0).as("deleted"))
      val src = s"$base/src"
      val dst = s"$base/dst"
      t("rep.init.src") {
        graft.cdc.Compaction.init(snapshot, src,
          key = "id", versionCol = "version", deleteCol = "deleted",
          nBuckets = 16)
      }
      t("rep.merge1+feed") {
        graft.cdc.Compaction.merge(s, src, batch(3, 1L), emitFeed = true)
      }
      t("rep.replicator.init") {
        graft.cdc.Replicator.init(s, src, dst)
      }
      t("rep.merge2+feed") {
        graft.cdc.Compaction.merge(s, src, batch(7, 2L), emitFeed = true)
      }
      t("rep.merge3+feed") {
        graft.cdc.Compaction.merge(s, src, batch(11, 3L), emitFeed = true)
      }
      t("rep.sync") {
        graft.cdc.Replicator.sync(s, src, dst)
      }
      t("rep.read+agg") {
        graft.cdc.Compaction.read(s, dst)
          .groupBy()
          .agg(count(lit(1)).as("n_keys"),
            sum(dec18(col("price"))).cast("double").as("total"),
            sum(col("id") * col("version")).as("checksum"))
          .count()
      }
    }
    s.stop()
  }
}
