package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.AggView
import graft.streaming.StreamingAggView

/** The full maintained-view loop: a stream ingests into BOTH the base
  * table (append) and the AggView partials (foreachBatch merge, batch-
  * id fenced); after each drain the view re-registers with MvRewrite
  * and an UNCHANGED dashboard aggregate over the base table is served
  * from the O(|groups|) view — while remaining value-identical to a
  * direct base recompute. This is the composition the pieces exist
  * for: streaming ingest → incremental partials → transparent rewrite.
  */
class StreamingMvRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
  }

  test("streaming-maintained AggView serves rewritten dashboard queries") {
    val root = tmpDir("smv")
    val baseDir = s"$root/base"
    val srcDir = s"$root/src"
    val viewDir = s"$root/view"

    val b0 = (1L to 30L).map(k => (k % 5, 2.0 + k))
    b0.toDF("grp", "v").write.mode("append").parquet(baseDir)
    AggView.init(b0.toDF("grp", "v"), viewDir, "grp", "v", nBuckets = 4)

    def ingest(rows: Seq[(Long, Double)]): Unit = {
      val df = rows.toDF("grp", "v")
      df.coalesce(1).write.mode("append").parquet(srcDir)
      df.write.mode("append").parquet(baseDir)
      val src = spark.readStream.schema("grp LONG, v DOUBLE").parquet(srcDir)
      val q = StreamingAggView.aggStream(src, viewDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    def dashboard() = spark.read.parquet(baseDir)
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,2)")).as("total"))

    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

    withRule {
      for (batch <- Seq(
          Seq((1L, 5.0), (7L, 7.5)),
          Seq((2L, 3.25), (7L, 1.0), (9L, 4.0)))) {
        ingest(batch)
        Mv.registerAggView(spark, viewDir, baseDir)
        try {
          val served = dashboard()
          assert(Mv.readsView(served, s"$viewDir/data"),
            served.queryExecution.optimizedPlan.toString)
          val got = asMap(served.collect())
          Mv.deregister(baseDir)
          val direct = asMap(dashboard().collect())
          assert(got == direct)
        } finally Mv.deregister(baseDir)
      }
    }

    // min/max are NOT derivable from an AggView (no order statistics):
    // the rewrite must leave such dashboards on the base table
    withRule {
      Mv.registerAggView(spark, viewDir, baseDir)
      try {
        val withMin = spark.read.parquet(baseDir)
          .groupBy($"grp").agg(min($"v".cast("decimal(18,2)")).as("mn"))
        assert(!Mv.readsView(withMin, s"$viewDir/data"))
      } finally Mv.deregister(baseDir)
    }
  }
}
