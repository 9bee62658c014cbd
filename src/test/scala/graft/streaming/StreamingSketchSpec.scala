package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.DetSketch

/** Streamed register state must equal the one-shot sketch over
  * everything that ever flowed through — across checkpointed drains
  * and a replayed batch (merge idempotence).
  */
class StreamingSketchSpec extends SparkSpec {

  import spark.implicits._

  private def regs(dir: String): Set[(Long, Long)] =
    spark.read.parquet(dir).select("bucket", "register")
      .as[(Long, Long)].collect().toSet

  private def oneShot(keys: Seq[Long]): Set[(Long, Long)] =
    DetSketch.hllRegisters(keys.toDF("k"), "k", p = 6)
      .as[(Long, Long)].collect().toSet

  test("streamed registers == one-shot over all drained batches") {
    val root = tmpDir("ssketch")
    val srcDir = s"$root/src"
    val stateDir = s"$root/state"

    val b1 = (1L to 400L)
    DetSketch.initHllState(b1.toDF("k"), "k", stateDir, p = 6)

    def drain(): Unit = {
      val src = spark.readStream
        .schema("k LONG").parquet(srcDir)
      val q = StreamingSketch.hllStream(src, "k", stateDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    val b2 = (350L to 700L)
    b2.toDF("k").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(regs(stateDir) == oneShot(b1 ++ b2))

    // second drain after restart: overlapping + fresh keys
    val b3 = (650L to 1000L)
    b3.toDF("k").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val afterB3 = regs(stateDir)
    assert(afterB3 == oneShot(b1 ++ b2 ++ b3))

    // replay: folding an already-seen batch changes nothing
    DetSketch.mergeHllState(spark, stateDir, b2.toDF("k"), "k")
    assert(regs(stateDir) == afterB3)

    // and the estimate tracks the true distinct count (1000)
    val est = DetSketch.hllEstimate(
      afterB3.toSeq.map { case (b, r) => (b, r) }, p = 6)
    assert(math.abs(est - 1000.0) / 1000.0 < 3 * 1.04 / 8)
  }
}
