package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Secondary clustering inside buckets (r5 verdict item 8): hash
  * bucketing prunes to the right DIRECTORY; `clusterBy` sorts rows
  * inside each bucket (plain sort for one column, Z-order for two) so
  * parquet row-group min/max stats prune non-key range predicates
  * WITHIN the surviving buckets. The specs force small row groups and
  * compare the scan's emitted rows — row-group pruning happens before
  * Spark re-evaluates the filter, so fewer emitted rows = fewer groups
  * read.
  */
class ClusteredCompactionSpec extends SparkSpec {

  import spark.implicits._

  /** Rows a filtered read of the table pulls OUT OF THE SCAN (i.e.
    * surviving parquet row-group pruning, before Spark's re-filter).
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  private def withTinyRowGroups[A](body: => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    val old = conf.get("parquet.block.size")
    conf.set("parquet.block.size", "16384")
    try body
    finally {
      if (old == null) conf.unset("parquet.block.size")
      else conf.set("parquet.block.size", old)
    }
  }

  // 20k rows; x cycles 0..199 so an UNCLUSTERED layout spreads every x
  // value across every row group, while clustering packs each x run
  private def rows: DataFrame =
    spark.range(20000).select(col("id"),
      (col("id") % 200).as("x"),
      (col("id") % 97).as("y"),
      concat(lit("pad-"), col("id"), lit("-"),
        lpad(lit("z"), 64, "z")).as("payload"),
      lit(0L).as("version"), lit(false).as("deleted"))

  test("clusterBy column prunes row groups; merge preserves the layout") {
    withTinyRowGroups {
      val plain = tmpDir("cluster-plain") + "/t"
      val clustered = tmpDir("cluster-sorted") + "/t"
      Compaction.init(rows, plain, Seq("id"), "version", "deleted", 2)
      Compaction.init(rows, clustered, Seq("id"), "version", "deleted",
        nBuckets = 2, clusterBy = Seq("x"))

      def probe(dir: String): Long =
        scannedRows(Compaction.read(spark, dir).filter(col("x") === 5))

      val (scanPlain, scanClustered) = (probe(plain), probe(clustered))
      // both answer identically…
      assert(Compaction.read(spark, clustered).filter(col("x") === 5)
        .count() == 100)
      // …but the clustered layout reads a fraction of the row groups
      assert(scanClustered * 4 <= scanPlain,
        s"clustering did not prune: clustered=$scanClustered plain=$scanPlain")

      // a merge rewriting a bucket re-applies the sort: pruning holds
      Compaction.merge(spark, clustered,
        spark.range(50).select((col("id") + 50000).as("id"),
          (col("id") % 200).as("x"), (col("id") % 97).as("y"),
          lit("new").as("payload"), lit(1L).as("version"),
          lit(false).as("deleted")))
      val after = scannedRows(
        Compaction.read(spark, clustered).filter(col("x") === 5))
      assert(after * 4 <= scanPlain,
        s"merge destroyed clustering: after=$after plain=$scanPlain")
    }
  }

  test("leaf-level cluster zone maps prune _tp dirs on a clustered+" +
      "time-partitioned table — both SQL routes (r13)") {
    // price is correlated with the DAY: day d holds prices
    // [d*100, d*100+50), so every bucket's fold spans [100, 550)
    // (bucket-level cluster pruning keeps all buckets) while each
    // (bucket, leaf) is disjoint — only the per-leaf bounds can prune
    def data = spark.range(200).select(col("id"),
      ((lit(1) + col("id") % 5) * 100 + col("id") % 50)
        .cast("double").as("price"),
      expr("make_timestamp(2024, 1, CAST(1 + id % 5 AS INT), 12, 0, 0)")
        .as("ts"),
      lit(0L).as("version"), lit(false).as("deleted"))
    val expected = (0L until 200L).filter(_ % 5 == 2).toSet

    // route 1: registered view + MergePruning (DOUBLE cluster column —
    // exercises the Spark-aggregate leaf-stats path)
    val dir = tmpDir("cluster-leaf") + "/t"
    Compaction.init(data, dir, Seq("id"), "version", "deleted",
      nBuckets = 4, clusterBy = Seq("price"), feed = false,
      timePartition = Some("days" -> "ts"))
    val leafKeys = TxLog.latest(spark, dir).get.props.keys
      .filter(k => k.startsWith("cmin.") && k.split("\\.").length == 4)
    assert(leafKeys.nonEmpty, "no leaf-granular cmin keys recorded")
    val rule = graft.plans.MergePruning
    val added = !spark.experimental.extraOptimizations.contains(rule)
    if (added) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      Compaction.read(spark, dir).createOrReplaceTempView("cl_leaf_t")
      val df = spark.sql(
        "SELECT id FROM cl_leaf_t WHERE price >= 300.0 AND price < 350.0")
      assert(df.as[Long].collect().toSet == expected)
      val opened = df.inputFiles
      // 2024-01-03 = epoch day 19725: the only leaf the range can hit
      assert(opened.nonEmpty && opened.forall(_.contains("_tp=19725")),
        s"cluster range must prune to one _tp leaf per bucket:\n" +
          opened.mkString("\n"))
    } finally if (added) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)

    // route 2 (the DSv2 catalog scan, BIGINT cluster column through
    // the footer-stats leaf path) is pinned in TimePartitionSpec —
    // GraftCleanPartition is private[catalog]
  }

  test("two-column clusterBy (Z-order) prunes on BOTH dimensions") {
    withTinyRowGroups {
      val z = tmpDir("cluster-z") + "/t"
      val plain = tmpDir("cluster-z-plain") + "/t"
      Compaction.init(rows, plain, Seq("id"), "version", "deleted", 2)
      Compaction.init(rows, z, Seq("id"), "version", "deleted",
        nBuckets = 2, clusterBy = Seq("x", "y"))
      def probe(dir: String, c: String): Long =
        scannedRows(Compaction.read(spark, dir).filter(col(c) === 5))
      // a single-column sort would prune only its leading column; the
      // Morton layout must beat the unclustered scan on EACH dimension
      assert(probe(z, "x") * 2 <= probe(plain, "x"),
        "z-order did not prune on x")
      assert(probe(z, "y") * 2 <= probe(plain, "y"),
        "z-order did not prune on y")
      // content identical to the unclustered twin
      assert(Compaction.read(spark, z).orderBy("id").collect().toSeq ==
        Compaction.read(spark, plain).orderBy("id").collect().toSeq)
    }
  }
}
