package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.Compaction

/** Streaming keyed MERGE: micro-batched changelogs maintain the
  * compacted table with batch semantics (latest version wins, deletes
  * remove keys), checkpointed across drains, and a replayed batch
  * converges to the same state (merge idempotence — foreachBatch is
  * at-least-once, the table must not care).
  */
class StreamingCompactionSpec extends SparkSpec {

  import spark.implicits._

  private def changeSchema =
    implicitly[org.apache.spark.sql.Encoder[
      StreamingCompactionSpec.ChangeRow]].schema

  private def readState(dir: String): Set[(Long, String, Long)] =
    Compaction.read(spark, dir).select("id", "payload", "version")
      .as[(Long, String, Long)].collect().toSet

  test("micro-batched changelogs maintain the table across drains") {
    val root = tmpDir("scompact")
    val srcDir = s"$root/changes"
    val tableDir = s"$root/table"

    val snapshot = spark.range(1, 51).select(col("id"),
      concat(lit("v0-"), col("id")).as("payload"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Compaction.init(snapshot, tableDir, "id", "version", "deleted",
      nBuckets = 8)

    def drain(): Unit = {
      val src = spark.readStream.schema(changeSchema).parquet(srcDir)
      val q = StreamingCompaction.mergeStream(src, tableDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    // batch 1: update + insert
    Seq((7L, "v1-7", 1L, false), (99L, "v1-99", 1L, false))
      .toDF("id", "payload", "version", "deleted")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val s1 = readState(tableDir).map(r => r._1 -> r._2).toMap
    assert(s1(7L) == "v1-7" && s1(99L) == "v1-99" && s1.size == 51)

    // batch 2 (after a checkpointed restart): re-update + delete
    Seq((7L, "v2-7", 2L, false), (99L, "", 2L, true))
      .toDF("id", "payload", "version", "deleted")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val s2 = readState(tableDir).map(r => r._1 -> r._2).toMap
    assert(s2(7L) == "v2-7" && !s2.contains(99L) && s2.size == 50)
  }

  test("a replayed batch merges idempotently") {
    val root = tmpDir("scompact-replay")
    val tableDir = s"$root/table"
    val snapshot = spark.range(1, 21).select(col("id"),
      concat(lit("v0-"), col("id")).as("payload"),
      lit(0L).as("version"), lit(false).as("deleted"))
    Compaction.init(snapshot, tableDir, "id", "version", "deleted",
      nBuckets = 4)

    val batch: DataFrame =
      Seq((3L, "v1-3", 1L, false), (5L, "", 1L, true))
        .toDF("id", "payload", "version", "deleted")
    Compaction.merge(spark, tableDir, batch)
    val afterOnce = readState(tableDir)
    Compaction.merge(spark, tableDir, batch) // the at-least-once replay
    assert(readState(tableDir) == afterOnce)
  }
}

object StreamingCompactionSpec {
  /** Changelog row shape — named fields so the stream's read schema
    * matches the parquet columns (tuple encoders would read _1.._4).
    */
  final case class ChangeRow(
      id: Long, payload: String, version: Long, deleted: Boolean)
}
