package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.Scd2

/** Streaming SCD2 maintenance: micro-batched changelogs build the same
  * history a one-shot init over everything would (checkpointed across
  * drains, out-of-order batches splicing late), and the current() view
  * tracks upserts/deletes as the stream advances.
  */
class StreamingScd2Spec extends SparkSpec {

  import spark.implicits._

  private def changeSchema =
    implicitly[org.apache.spark.sql.Encoder[
      StreamingScd2Spec.ChangeRow]].schema

  private type Row4 = (Long, String, Long, Option[Long], Boolean)

  private def history(dir: String): Set[Row4] =
    Scd2.read(spark, dir)
      .select(col("id"), col("payload"), col("version"),
        col("valid_to"), col("is_current"))
      .as[Row4].collect().toSet

  test("streamed history == one-shot rebuild; current() tracks the stream") {
    val root = tmpDir("sscd2")
    val srcDir = s"$root/changes"
    val tableDir = s"$root/table"

    val initRows = (1L to 20L).map(i => (i, s"v0-$i", 0L, false))
    Scd2.init(initRows.toDF("id", "payload", "version", "deleted"),
      tableDir, "id", "version", "deleted", nBuckets = 4)

    def drain(): Unit = {
      val src = spark.readStream.schema(changeSchema).parquet(srcDir)
      val q = StreamingScd2.historyStream(src, tableDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    // batch 1: update key 7 (v2), tombstone key 9
    val b1 = Seq((7L, "v2-7", 2L, false), (9L, "", 1L, true))
    b1.toDF("id", "payload", "version", "deleted")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val cur1 = Scd2.current(spark, tableDir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(cur1(7L) == "v2-7" && !cur1.contains(9L) && cur1.size == 19)

    // batch 2 after a checkpointed restart: LATE v1 for key 7 (splices
    // between v0 and v2), new key 21
    val b2 = Seq((7L, "v1-7-late", 1L, false), (21L, "v1-21", 1L, false))
    b2.toDF("id", "payload", "version", "deleted")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    // ground truth: one init over everything
    val rebuildDir = tmpDir("sscd2-rebuild")
    Scd2.init((initRows ++ b1 ++ b2)
        .toDF("id", "payload", "version", "deleted"),
      rebuildDir, "id", "version", "deleted", nBuckets = 4)
    assert(history(tableDir) == history(rebuildDir))
    // the late splice closed against v2, current payload unchanged
    val cur2 = Scd2.current(spark, tableDir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(cur2(7L) == "v2-7" && cur2(21L) == "v1-21")
  }
}

object StreamingScd2Spec {
  /** Changelog row shape — named fields so the stream's read schema
    * matches the parquet columns.
    */
  final case class ChangeRow(
      id: Long, payload: String, version: Long, deleted: Boolean)
}
