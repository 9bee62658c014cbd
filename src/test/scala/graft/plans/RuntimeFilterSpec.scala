package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning: when a selective dimension joins
  * a large fact through a shuffle join, Catalyst can inject a bloom
  * filter built from the dimension's join keys into the fact scan, so
  * most fact rows drop before the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * matching slice; this spec pins that the optimizer actually injects
  * it for the engine's dimension-join shape (thresholds lowered to
  * fire at test scale — production sizes clear them naturally).
  */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  test("selective dim join injects a bloom filter on the fact side") {
    val dir = tmpDir("rtf")
    // runtime filters only consider file-scan relations (size estimates
    // come from the files), so materialize both sides as parquet
    spark.range(0, 200000)
      .select($"id".as("f_key"), ($"id" % 97).as("f_val"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 20000).select($"id".as("d_key"), ($"id" % 7).as("d_cat"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (no broadcast) and let the filter fire at
      // test-file sizes
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"d_cat" === 3)
      val q = fact.join(dim, $"f_key" === $"d_key")
        .groupBy($"d_cat").agg(count(lit(1)).as("n"))

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "no bloom runtime filter injected:\n" + optimized.take(800))

      // and the filtered plan still computes the right answer
      val row = q.collect().head
      assert(row.getLong(0) == 3L && row.getLong(1) > 0L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
