package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.cdc.UserRow

/** Cross-batch stateful dedup: the same email arriving in a later
  * micro-batch is suppressed; state persists in the checkpoint.
  */
class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState suppresses duplicate keys across batches") {
    val root = tmpDir("sdedup")
    val srcDir = s"$root/src"

    // batch 1: two distinct emails + an in-batch duplicate
    Seq(
      UserRow(1, "A", "a@x.com", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:00:00"), false),
      UserRow(2, "B", "b@x.com", ts("2026-01-01 11:00:00"), ts("2026-01-01 11:00:00"), false),
      UserRow(3, "A2", "a@x.com", ts("2026-01-01 12:00:00"), ts("2026-01-01 12:00:00"), false),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)

    val collected = new scala.collection.mutable.ArrayBuffer[UserRow]()

    def runDrain(): Unit = {
      val src = spark.readStream.schema(graft.cdc.Schemas.users)
        .parquet(srcDir).as[UserRow]
      val deduped = StreamingDedup.firstPerKey[UserRow](src, _.email)
      val q = deduped.writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserRow], _: Long) =>
          collected.synchronized { collected ++= batch.collect() }
          ()
        }
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    runDrain()
    val out1 = collected.toSeq
    assert(out1.map(_.email).sorted == Seq("a@x.com", "b@x.com"))

    // batch 2: duplicate of a@x.com (suppressed) + a new email (kept)
    Seq(
      UserRow(4, "A3", "a@x.com", ts("2026-01-02 10:00:00"), ts("2026-01-02 10:00:00"), false),
      UserRow(5, "C", "c@x.com", ts("2026-01-02 11:00:00"), ts("2026-01-02 11:00:00"), false),
    ).toDF().coalesce(1).write.mode("append").parquet(srcDir)

    runDrain()
    val out2 = collected.toSeq
    assert(out2.map(_.email).sorted ==
      Seq("a@x.com", "b@x.com", "c@x.com"))
    assert(!out2.map(_.id).contains(4L)) // the cross-batch dup was dropped
  }

  test("built-in dropDuplicatesWithinWatermark: bounded-state semantics") {
    // the engine's own watermarked dedup: duplicates are suppressed
    // WHILE the key's state lives (until the watermark passes event
    // time + delay), and re-emit after eviction — that bounded
    // re-emission is exactly what buys constant state on an unbounded
    // stream, so the spec pins both directions.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("ddww")
    val srcDir = s"$root/src"
    val outDir = s"$root/out"

    def drain(): Unit = {
      val src = spark.readStream.schema("id LONG, ts TIMESTAMP")
        .parquet(srcDir)
      val q = src.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }
    def counts: Map[Long, Long] =
      spark.read.parquet(outDir).groupBy(col("id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
        (2L, ts("2024-01-01 10:00:00")))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(counts == Map(1L -> 1L, 2L -> 1L)) // in-window dup suppressed

    // watermark is still behind id=1's expiry at batch start: suppressed
    Seq((1L, ts("2024-01-01 12:00:00")))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(counts == Map(1L -> 1L, 2L -> 1L))

    // now the watermark (11:50) passed 10:00 + 10min: state evicted,
    // the same id legitimately re-emits
    Seq((1L, ts("2024-01-01 12:30:00")))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(counts == Map(1L -> 2L, 2L -> 1L))
  }
}
