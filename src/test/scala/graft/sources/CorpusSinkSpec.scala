package graft.sources

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, LongType}

import graft.SparkSpec

/** JSONL + layout-parquet sinks: round-trip fidelity, bounded file
  * sizes, directory partitioning with scan pruning, intra-file order.
  */
class CorpusSinkSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private def corpus = (1L to 100L).map(i =>
    (i, if (i % 3 == 0) "fr" else "en", s"doc number $i words"))
    .toDF("doc_id", "lang", "text")

  test("jsonl round-trips and bounds records per file") {
    val dir = tmpDir("jsonl")
    CorpusSink.writeJsonl(corpus, s"$dir/out", partitionCol = Some("lang"),
      sortCol = "doc_id", maxRecordsPerFile = 10)

    val back = CorpusSink.readJsonl(spark, s"$dir/out", schema)
    assert(back.count() == 100)
    // full-fidelity round trip, including the partition column
    val a = corpus.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.select("doc_id", "lang", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)

    // bounded shards: no json file holds more than maxRecordsPerFile
    val files = new File(s"$dir/out/lang=en").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    val counts = files.map(f =>
      scala.io.Source.fromFile(f).getLines().size)
    assert(counts.forall(_ <= 10), counts.toSeq.toString)
    assert(counts.sum == 67) // 100 - 33 multiples of 3
  }

  test("partition-column predicate prunes jsonl directories") {
    val dir = tmpDir("jsonlprune")
    CorpusSink.writeJsonl(corpus, s"$dir/out", partitionCol = Some("lang"),
      sortCol = "doc_id", maxRecordsPerFile = 1000)
    val fr = CorpusSink.readJsonl(spark, s"$dir/out", schema)
      .filter(col("lang") === "fr")
    // pruned scan: the lang predicate must be a PartitionFilters entry
    // on the scan (subtree pruning), not a post-scan Filter over all rows
    val scan = fr.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      scan.take(400))
    assert(fr.count() == 33)
  }

  test("quarantine read splits malformed lines from good rows") {
    val dir = tmpDir("jsonlq")
    val f = new java.io.PrintWriter(s"$dir/shard.json")
    f.println("""{"doc_id": 1, "lang": "en", "text": "ok one"}""")
    f.println("""{"doc_id": 2, "lang": "en", "text": "ok two"}""")
    f.println("""{"doc_id": 3, "lang": BROKEN""")
    f.println("""not json at all""")
    f.close()

    val q = CorpusSink.readJsonlQuarantine(spark, dir, schema)
    assert(q.good.orderBy("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(q.good.columns.toSeq == schema.fieldNames.toSeq) // corrupt col not leaked
    val rawBad = q.bad.collect().map(_.getString(0)).toSeq.sorted
    assert(rawBad.size == 2 && rawBad.exists(_.contains("BROKEN"))
      && rawBad.contains("not json at all"))
    q.release() // drops the shared scan cache
  }

  test("layout parquet sorts within files so min/max stats are selective") {
    val dir = tmpDir("layoutpq")
    CorpusSink.writeParquet(corpus, s"$dir/out", partitionCol = "lang",
      sortCol = "doc_id", maxRecordsPerFile = 25)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 100)

    // each file's rows arrive sorted by doc_id (local order preserved)
    val files = new File(s"$dir/out/lang=en").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"unsorted rows in $f")
    }
  }

  test("orc layout round-trips, prunes partitions, pushes predicates") {
    val dir = tmpDir("layoutorc")
    CorpusSink.writeOrc(corpus, s"$dir/out", partitionCol = "lang",
      sortCol = "doc_id", maxRecordsPerFile = 25)

    val back = CorpusSink.readOrc(spark, s"$dir/out",
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    assert(back.count() == 100)
    // value fidelity vs the source frame
    val got = back.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val want = corpus.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.sameElements(want))

    // partition-column predicate prunes to the lang=fr subtree and a
    // data predicate reaches the ORC scan as a pushed filter
    val q = back.filter(col("lang") === "fr" && col("doc_id") > 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), plan.take(800))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(doc_id,50)"), plan.take(800))
    assert(q.count() == corpus
      .filter(col("lang") === "fr" && col("doc_id") > 50).count())

    // intra-file sort holds in ORC files too
    val files = new File(s"$dir/out/lang=en").listFiles()
      .filter(_.getName.endsWith(".orc")).map(_.getPath)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.orc(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"unsorted rows in $f")
    }
  }
}
