package graft.cdc

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sharded CSV export: rows counted during the ONE write job (no
  * second scan of the output), and the part manifest makes the export
  * verifiable without re-reading.
  */
class CsvShardedSpec extends SparkSpec {

  import spark.implicits._

  test("sharded write counts in-job and emits a verifiable part manifest") {
    val out = tmpDir("csv-sharded") + "/export"
    // 7 slices at the source (no shuffle): under AQE a repartition
    // would itself materialize as a separate job and muddy the
    // one-job assertion below
    val df = spark.range(0, 10000, 1, 7)
      .select(col("id"), concat(lit("u"), col("id")).as("name"),
        (col("id") % 2 === 0).as("flag"))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val rows = try {
      val r = CsvSink.write(df, out, singleFile = false)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
      r
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(rows == 10000L)
    // exactly ONE job ran: the write itself — the old implementation
    // scheduled a second full read of its own output just to count
    assert(jobs.get() == 1, s"expected 1 job for the write, saw ${jobs.get()}")

    // manifest: ordered parts, per-part rows summing to the total,
    // real byte sizes
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/_MANIFEST.json")), "UTF-8")
    assert(manifest.contains("\"rows\":10000"))
    val partRows = "\"rows\":(\\d+)".r.findAllMatchIn(manifest)
      .map(_.group(1).toLong).toSeq
    // first match is the total; the rest are the 7 parts
    assert(partRows.head == 10000L && partRows.tail.sum == 10000L)
    assert(partRows.tail.size == 7)
    assert("\"bytes\":(\\d+)".r.findAllMatchIn(manifest)
      .map(_.group(1).toLong).forall(_ > 0))

    // the files themselves agree (the verification a consumer would
    // only need to run if it distrusts the manifest)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 10000L)
    assert(back.filter(col("flag") === "True").count() == 5000L)
  }

  test("empty sharded export: zero rows, manifest still written") {
    val out = tmpDir("csv-sharded-empty") + "/export"
    val rows = CsvSink.write(
      spark.range(0).select(col("id")), out, singleFile = false)
    assert(rows == 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/_MANIFEST.json")))
  }
}
