package graft

import org.apache.spark.sql.SparkSession

/** Canonical tuned SparkSession for this engine. One place for the
  * settings that matter at scale so every entry point (Verify, Bench,
  * demos, user code) runs the same engine:
  *
  *  - AQE on (runtime join-strategy switch, partition coalescing, skew
  *    splitting) — the 100 TB safety net for mis-estimated stages;
  *  - shuffle partitions sized to the machine (never the 200 default);
  *  - UTC session timezone (oracle parity, TIMESTAMPTZ semantics);
  *  - ns parquet timestamps read as long (see Tables.eventsSince);
  *  - extensions registered so SQL users get the native functions.
  */
object GraftSession {

  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // 128 MiB scan splits: big enough to amortize task overhead,
      // small enough that a task's working set fits executor memory at
      // the 100 TB target — stated explicitly so the sizing intent
      // survives default changes
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def get(appName: String = "graft"): SparkSession = {
    val s = builder().appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
