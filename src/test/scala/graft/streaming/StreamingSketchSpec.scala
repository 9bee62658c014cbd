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

  test("streamed Misra-Gries keeps the superset guarantee across drains") {
    import graft.operators.HeavyHitters
    val root = tmpDir("smg")
    val srcDir = s"$root/src"
    val stateDir = s"$root/state"
    val m = 4

    // skewed stream: "hot" dominates, "warm" above 1/(m+1), noise below
    def mkBatch(seed: Int): Seq[String] =
      Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
        (1 to 15).map(i => s"noise-$seed-$i")
    val b1 = mkBatch(1)
    HeavyHitters.initMgState(b1.toDF("k"), "k", stateDir, m)

    def drain(): Unit = {
      val src = spark.readStream.schema("k STRING").parquet(srcDir)
      val q = StreamingSketch.heavyHittersStream(src, "k", stateDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    val b2 = mkBatch(2)
    b2.toDF("k").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val b3 = mkBatch(3)
    b3.toDF("k").coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val all = b1 ++ b2 ++ b3
    val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val state = spark.read.parquet(stateDir)
      .filter(col("key").isNotNull)
      .select("key", "cnt").as[(String, Long)].collect().toMap
    assert(spark.read.parquet(stateDir)
      .select(max(col("n_total"))).head().getLong(0) == n)
    // superset: every key above n/(m+1) must be retained
    truth.filter(_._2 > n / (m + 1)).keys.foreach { k =>
      assert(state.contains(k), s"heavy hitter $k lost")
    }
    // counts understate by at most n/(m+1), never overstate
    state.foreach { case (k, c) =>
      assert(c <= truth.getOrElse(k, 0L), s"$k overcounted")
      assert(truth(k) - c <= n / (m + 1), s"$k undercounted past bound")
    }
    // replay: counts only grow; heavy hitters still present
    HeavyHitters.mergeMgState(spark, stateDir, b2.toDF("k"), "k")
    val replayed = spark.read.parquet(stateDir)
      .filter(col("key").isNotNull)
      .select("key", "cnt").as[(String, Long)].collect().toMap
    assert(replayed.contains("hot") && replayed.contains("warm"))
  }
}
