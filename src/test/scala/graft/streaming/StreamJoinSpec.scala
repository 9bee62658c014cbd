package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static join enriches a stream with a dimension without state") {
    val root = tmpDir("ssjoin")
    val srcDir = s"$root/src"
    Seq(
      (1L, ts("2026-01-01 09:00:00"), 7L, "view"),
      (2L, ts("2026-01-01 09:05:00"), 8L, "purchase"),
      (3L, ts("2026-01-01 09:10:00"), 99L, "view"), // no dim row -> dropped
    ).toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(srcDir)
    // static dimension: a plain batch DataFrame joined into the stream —
    // broadcast per micro-batch, no streaming state involved
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")

    val collected = new scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = src.join(org.apache.spark.sql.functions.broadcast(dim), "user_id")
      .select("event_id", "tier")
      .writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= b.collect().map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    assert(collected.toSet == Set((1L, "gold"), (2L, "basic")))
  }

  test("stream-stream interval join attributes views within the window only") {
    val root = tmpDir("sjoin")
    val srcDir = s"$root/src"
    Seq(
      (10L, ts("2026-01-01 09:10:00"), 1L, "view"),     // within 1h of purchase
      (11L, ts("2026-01-01 08:30:00"), 1L, "view"),     // too early (>1h before)
      (12L, ts("2026-01-01 09:30:00"), 2L, "view"),     // other user
      (20L, ts("2026-01-01 09:50:00"), 1L, "purchase"),
      (21L, ts("2026-01-01 10:30:00"), 2L, "purchase"), // view 12 within 1h
    ).toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val collected = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamJoin.purchaseViewAttribution(src)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= batch.select("purchase_id", "view_id")
            .collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.toString)
    assert(collected.toSet == Set((20L, 10L), (21L, 12L)))
  }
}
