package graft.catalog

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.{Compaction, TxLog}

private[catalog] case class Chg(id: Long, name: String, version: Long,
    deleted: Boolean)

/** `writeStream.toTable("graft.t")` — the DSv2 STREAMING_WRITE path:
  * every micro-batch lands as ONE fenced merge (upsert-by-version,
  * tombstones delete), a checkpointed restart resumes without
  * double-applying or losing batches, and the staging the writers used
  * is gone after each commit.
  */
class StreamingWriteSpec extends SparkSpec {

  import spark.implicits._

  test("toTable merges micro-batches; checkpointed restart resumes exactly-once") {
    val root = tmpDir("gsw")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    spark.conf.set("spark.sql.catalog.gsw",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsw.warehouse", s"$root/wh")
    spark.sql("""CREATE TABLE gsw.t (
        id BIGINT, name STRING, version BIGINT, deleted BOOLEAN)
        TBLPROPERTIES ('keys'='id', 'buckets'='4')""")

    def drain(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Chg]].schema)
        .parquet(srcDir)
      val q = src.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .toTable("gsw.t")
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.toString)
    }

    // epoch 1: initial inserts
    (0L until 50L).map(i => Chg(i, s"v0-$i", 0L, deleted = false))
      .toDF().coalesce(2).write.mode("append").parquet(srcDir)
    drain()
    assert(spark.sql("SELECT count(*) AS n FROM gsw.t")
      .as[Long].head() == 50L)

    // epoch 2 through a RESTARTED query on the same checkpoint:
    // upserts + a tombstone + a new key
    Seq(Chg(7L, "v1-7", 1L, deleted = false),
      Chg(9L, "", 1L, deleted = true),
      Chg(50L, "v1-50", 1L, deleted = false))
      .toDF().coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val got = spark.sql("SELECT id, name FROM gsw.t")
      .as[(Long, String)].collect().toMap
    assert(got.size == 50) // 50 - 1 deleted + 1 new
    assert(got(7L) == "v1-7" && !got.contains(9L) && got(50L) == "v1-50")

    // a THIRD drain with nothing new is a no-op (no phantom merges)
    val vBefore = Compaction.version(spark, s"$root/wh/t")
    drain()
    assert(Compaction.version(spark, s"$root/wh/t") == vBefore)

    // writer staging cleaned up after commits
    val fs = TxLog.fs(spark, s"$root/wh/t")
    val leftovers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/wh/t")).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".streamwrite-"))
      .filter(d => fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/wh/t/$d")).nonEmpty)
    assert(leftovers.isEmpty, s"staged epochs left behind: $leftovers")

    // update output mode is accepted (merge IS the update)
    Seq(Chg(7L, "v2-7", 2L, deleted = false)).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Chg]].schema)
      .parquet(srcDir)
      .writeStream.outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .toTable("gsw.t")
    q2.awaitTermination()
    assert(q2.exception.isEmpty, q2.exception.toString)
    assert(spark.sql("SELECT name FROM gsw.t WHERE id = 7")
      .as[String].head() == "v2-7")
  }
}
