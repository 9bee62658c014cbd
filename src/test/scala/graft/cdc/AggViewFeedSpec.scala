package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Incremental view maintenance over the Compaction change data feed
  * (AggView.applyFeed): signed retraction-pair deltas keep a per-key
  * aggregate view equal to a from-scratch aggregation of the live
  * table after every feed batch — including keys that leave the view
  * when fully retracted — and the batch-id fence makes replays no-ops.
  * The last test drives the same maintenance through Structured
  * Streaming (file source over feed/, foreachBatch, checkpoint
  * restart), the deployment shape the feed exists for.
  */
class AggViewFeedSpec extends SparkSpec {

  import spark.implicits._

  private def viewState(dir: String): Map[Long, (Long, Double)] =
    AggView.read(spark, dir)
      .select(col("id"), col("cnt"), col("total").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def tableAgg(tableDir: String): Map[Long, (Long, Double)] =
    Compaction.read(spark, tableDir)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("price").cast("decimal(18,2)")).cast("double").as("total"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def changeDf(rows: Seq[(Long, Double, Long, Boolean)]): DataFrame =
    rows.toDF("id", "price", "version", "deleted")

  test("view over feed == recompute over table, across merge batches") {
    val root = tmpDir("ivm")
    val tableDir = s"$root/table"
    val viewDir = s"$root/view"
    Compaction.init(
      changeDf(Seq((1L, 10.0, 0L, false), (2L, 20.0, 0L, false),
        (3L, 30.0, 0L, false))),
      tableDir, "id", "version", "deleted", nBuckets = 4)
    AggView.init(Compaction.read(spark, tableDir).select("id", "price"),
      viewDir, "id", "price", nBuckets = 4)

    // batch 0: update 2, insert 4, delete 3 (3 leaves the view)
    Compaction.merge(spark, tableDir,
      changeDf(Seq((2L, 25.0, 1L, false), (4L, 40.0, 1L, false),
        (3L, 0.0, 1L, true))), emitFeed = true)
    val s0 = AggView.applyFeed(spark, viewDir,
      Compaction.readFeed(spark, tableDir).filter(col("batch") === 0),
      batchId = 0L)
    assert(s0.applied)
    assert(viewState(viewDir) == tableAgg(tableDir))
    assert(!viewState(viewDir).contains(3L), "retracted key still in view")

    // batch 1: delete the remaining original keys too
    Compaction.merge(spark, tableDir,
      changeDf(Seq((1L, 0.0, 2L, true), (2L, 0.0, 2L, true))),
      emitFeed = true)
    AggView.applyFeed(spark, viewDir,
      Compaction.readFeed(spark, tableDir).filter(col("batch") === 1),
      batchId = 1L)
    assert(viewState(viewDir) == tableAgg(tableDir))
    assert(viewState(viewDir).keySet == Set(4L))
  }

  test("replayed batch id is a no-op (exactly-once fence)") {
    val root = tmpDir("ivm")
    val tableDir = s"$root/table"
    val viewDir = s"$root/view"
    Compaction.init(changeDf(Seq((1L, 10.0, 0L, false))),
      tableDir, "id", "version", "deleted", nBuckets = 2)
    AggView.init(Compaction.read(spark, tableDir).select("id", "price"),
      viewDir, "id", "price", nBuckets = 2)
    Compaction.merge(spark, tableDir,
      changeDf(Seq((1L, 99.0, 1L, false))), emitFeed = true)
    val feed = Compaction.readFeed(spark, tableDir)
    assert(AggView.applyFeed(spark, viewDir, feed, 0L).applied)
    val after = viewState(viewDir)
    val replay = AggView.applyFeed(spark, viewDir, feed, 0L)
    assert(!replay.applied)
    assert(viewState(viewDir) == after, "replay moved the view")
  }

  test("streaming foreachBatch maintenance with checkpoint restart") {
    val root = tmpDir("ivm")
    val tableDir = s"$root/table"
    val viewDir = s"$root/view"
    Compaction.init(
      changeDf(Seq((1L, 10.0, 0L, false), (2L, 20.0, 0L, false))),
      tableDir, "id", "version", "deleted", nBuckets = 4)
    AggView.init(Compaction.read(spark, tableDir).select("id", "price"),
      viewDir, "id", "price", nBuckets = 4)

    val feedSchema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("version", LongType), StructField("deleted", BooleanType),
      StructField("_change_type", StringType)))
    def drain(): Unit = {
      val q = spark.readStream.schema(feedSchema)
        .parquet(s"$tableDir/feed/batch=*")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          AggView.applyFeed(spark, viewDir, b, id); ()
        }
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    Compaction.merge(spark, tableDir,
      changeDf(Seq((2L, 22.0, 1L, false), (5L, 50.0, 1L, false))),
      emitFeed = true)
    drain()
    assert(viewState(viewDir) == tableAgg(tableDir))

    // new merges land while the stream is down; the restarted stream
    // resumes from the checkpoint and folds in only the new batches
    Compaction.merge(spark, tableDir,
      changeDf(Seq((1L, 0.0, 2L, true))), emitFeed = true)
    Compaction.merge(spark, tableDir,
      changeDf(Seq((5L, 55.0, 3L, false))), emitFeed = true)
    drain()
    assert(viewState(viewDir) == tableAgg(tableDir))
    assert(viewState(viewDir).keySet == Set(2L, 5L))
  }
}
