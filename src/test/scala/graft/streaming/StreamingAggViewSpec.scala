package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.AggView

/** Streamed aggregate maintenance must equal a one-shot groupBy over
  * everything drained, across checkpointed restarts; and a manually
  * replayed batch id must not double-count (exactly-once via the
  * fence).
  */
class StreamingAggViewSpec extends SparkSpec {

  import spark.implicits._

  test("streamed view == one-shot aggregate across drains; replay fenced") {
    val root = tmpDir("saggview")
    val srcDir = s"$root/src"
    val tableDir = s"$root/table"

    val b0 = (1L to 20L).map(k => (k, 2.0))
    AggView.init(b0.toDF("k", "v"), tableDir, "k", "v", nBuckets = 4)

    def drain(): Unit = {
      val src = spark.readStream.schema("k LONG, v DOUBLE").parquet(srcDir)
      val q = StreamingAggView.aggStream(src, tableDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    val b1 = Seq((1L, 5.0), (21L, 7.0))
    b1.toDF("k", "v").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val b2 = Seq((1L, 3.0), (21L, 1.0), (22L, 4.0))
    b2.toDF("k", "v").coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val all = b0 ++ b1 ++ b2
    val expected = all.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, BigDecimal(vs.map(_._2).sum).setScale(2)))
    }
    val got = AggView.read(spark, tableDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
    assert(got == expected)

    // replaying an already-applied foreachBatch id is a no-op
    val lastId = AggView.readMeta(spark, tableDir)._4
    AggView.merge(spark, tableDir, b2.toDF("k", "v"), lastId)
    val after = AggView.read(spark, tableDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
    assert(after == expected)
  }
}
