package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Full-battery scale bench (r5 verdict item 7): run EVERY SparkEntry
  * query at 1× (sf0.1) and at a synthesized 10× of it, and record the
  * per-query growth ratio — the whole-suite net that catches
  * superlinear tails the 8-op ScaleRehearsal misses.
  *
  * The 10× corpus is synthesized join-consistently: each key DOMAIN
  * gets one per-replica offset applied to every table carrying it
  * (orderkey in orders+lineitem, custkey in customer+orders, partkey /
  * suppkey in part / supplier / lineitem), so join fan-outs grow
  * linearly instead of quadratically; the tiny dims (region, nation)
  * stay fixed, as dims do at scale. Documents token-remap per replica
  * (verbatim copies would manufacture a near-dup k-clique per doc and
  * measure the data, not the operator — same rule as ScaleRehearsal);
  * embeddings get a per-replica component shift. `events.ts` stays the
  * raw int64-ns column so the pushed-filter path is identical.
  *
  * Timing is INTERLEAVED per query — 1× then 10× back to back — so a
  * ratio is immune to the JVM aging drift a sequential
  * full-suite-then-full-suite design would bake in (the round-4 bench
  * regression shape). Output: `BENCH_SF1_FULL.json` with per-query
  * ratios and a `flagged` list of queries above the bar (12 = linear
  * plus headroom for fixed costs and shuffle log-factors); Bench
  * embeds it into BENCH_DETAIL.json.
  */
object FullScaleBench {

  private val Factor = 10
  private val RatioBar = 12.0

  private def rep(spark: SparkSession) =
    explode(sequence(lit(0), lit(Factor - 1))).as("rep")

  /** Synthesize the 10× tables (idempotent: a marker file skips it). */
  def synth(spark: SparkSession, src: String, dst: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dst), spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(s"$dst/_SYNTH_DONE")
    if (fs.exists(marker)) return
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // fixed dims
    write(read("region"), "region")
    write(read("nation"), "nation")

    val C = 10000000L   // custkey offset per replica
    val O = 100000000L  // orderkey
    val P = 10000000L   // partkey
    val S = 10000000L   // suppkey
    val r = col("rep").cast("long")

    write(read("customer").select(col("*"), rep(spark))
      .withColumn("c_custkey", col("c_custkey") + r * C)
      .drop("rep"), "customer")
    write(read("supplier").select(col("*"), rep(spark))
      .withColumn("s_suppkey", col("s_suppkey") + r * S)
      .drop("rep"), "supplier")
    write(read("part").select(col("*"), rep(spark))
      .withColumn("p_partkey", col("p_partkey") + r * P)
      .drop("rep"), "part")
    write(read("orders").select(col("*"), rep(spark))
      .withColumn("o_orderkey", col("o_orderkey") + r * O)
      .withColumn("o_custkey", col("o_custkey") + r * C)
      .drop("rep"), "orders")
    write(read("lineitem").select(col("*"), rep(spark))
      .withColumn("l_orderkey", col("l_orderkey") + r * O)
      .withColumn("l_partkey", col("l_partkey") + r * P)
      .withColumn("l_suppkey", col("l_suppkey") + r * S)
      .drop("rep"), "lineitem")
    // events: new ids per replica; user/session structure repeats
    // (each user gets 10x the events — density growth, not key growth)
    write(read("events").select(col("*"), rep(spark))
      .withColumn("event_id", col("event_id") + r * 10000000L)
      .drop("rep"), "events")
    write(read("documents").select(col("*"), rep(spark))
      .withColumn("doc_id", col("doc_id") + r * 1000000L)
      .withColumn("text", when(col("rep") === 0, col("text")).otherwise(
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("~"), col("rep"))))))
      .withColumn("n_chars", length(col("text")))
      .drop("rep"), "documents")
    write(read("embeddings").select(col("*"), rep(spark))
      .withColumn("vec_id", col("vec_id") + r * 1000000L)
      .withColumn("embedding", transform(col("embedding"), (x, j) =>
        (x + ((r * (j + 1) % 7).cast("double") * 0.01).cast("float"))
          .cast("float")))
      .drop("rep"), "embeddings")
    fs.create(marker, true).close()
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-full-scale-bench")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      sys.props("java.io.tmpdir") + "/graft-synth-sf1")
    println(s"[fullscale] synthesizing ${Factor}x of $sfDir -> $dst")
    synth(spark, sfDir, dst)

    // One session PER SCALE: Spark caches v2 catalog instances per
    // session+name, so a `graftcat` instantiated against the 1x
    // warehouse silently ignores the 10x leg's warehouse re-set and
    // every catalog query's 10x timing would measure 1x-sized tables
    // (the r14 `sql_rtas_atomic` failure). newSession() shares the
    // SparkContext (same executors — timings stay comparable) but
    // carries its own SessionState/CatalogManager, so each scale's
    // first graftcat use binds to that scale's warehouse for good.
    // Temp views are session-scoped too, so the legs can't cross-read.
    val spark10 = spark.newSession()

    def run(name: String, s: org.apache.spark.sql.SparkSession,
            dir: String): Unit = {
      graft.SparkEntry.queries(name)(s, dir).queryExecution.toRdd.count()
      ()
    }
    // JVM/codegen warmup, untimed, on both sessions
    try run("cdc_counts", spark, sfDir) catch { case _: Throwable => () }
    try run("cdc_counts", spark10, dst) catch { case _: Throwable => () }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .forall(_.split(",").toSet.contains(n)))
    val rows = names.map { n =>
      spark.catalog.clearCache() // CacheManager lives in SharedState: one call covers both sessions
      val t1 = try time(run(n, spark, sfDir)) catch
        { case _: Throwable => Double.PositiveInfinity }
      val t10 = try time(run(n, spark10, dst)) catch
        { case _: Throwable => Double.PositiveInfinity }
      val ratio = t10 / math.max(t1, 0.001)
      println(f"[fullscale] $n%-28s x1=$t1%8.2f s  x10=$t10%8.2f s  ratio=$ratio%6.2f")
      (n, t1, t10, ratio)
    }
    val failed = rows.filter(r => r._2.isInfinity || r._3.isInfinity)
    val okFirst = rows.filterNot(r => r._2.isInfinity || r._3.isInfinity)
    // single-shot timing is noise-fragile: re-measure anything over the
    // bar once and keep the BETTER pair — a real superlinear query
    // reproduces, a GC/host spike does not. A tiny x1 denominator with
    // a small absolute x10 cost is also not a scale problem.
    val ok = okFirst.map {
      case r @ (n, _, _, ratio) if ratio > RatioBar =>
        spark.catalog.clearCache()
        val a2 = try time(run(n, spark, sfDir)) catch
          { case _: Throwable => Double.PositiveInfinity }
        val b2 = try time(run(n, spark10, dst)) catch
          { case _: Throwable => Double.PositiveInfinity }
        val r2 = b2 / math.max(a2, 0.001)
        println(f"[fullscale] recheck $n%-20s x1=$a2%8.2f s x10=$b2%8.2f s ratio=$r2%6.2f")
        if (r2.isNaN || r2 > ratio) r else (n, a2, b2, r2)
      case r => r
    }
    val flagged = ok.filter(r => r._4 > RatioBar && r._3 > 2.0)
    def fmt(v: Double) = f"$v%.2f"
    val qj = ok.map { case (n, a, b, rt) =>
      s""""$n":{"x1_sec":${fmt(a)},"x10_sec":${fmt(b)},"ratio":${fmt(rt)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"factor":$Factor,"n_queries":${rows.size},""" +
      s""""x1_total_sec":${fmt(ok.map(_._2).sum)},""" +
      s""""x10_total_sec":${fmt(ok.map(_._3).sum)},""" +
      s""""median_ratio":${fmt(ok.map(_._4).sorted.apply(ok.size / 2))},""" +
      s""""flagged_over_${RatioBar.toInt}":[${
        flagged.map("\"" + _._1 + "\"").mkString(",")}],""" +
      s""""failed":[${failed.map("\"" + _._1 + "\"").mkString(",")}],""" +
      s""""queries":$qj}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SF1_FULL.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
