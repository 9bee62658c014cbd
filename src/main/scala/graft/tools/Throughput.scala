package graft.tools
import org.apache.spark.sql.functions._
import graft.cdc._
object Throughput {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).appName("throughput").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("tput").toString
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val base = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    var t0 = System.nanoTime()
    Seeder.users(spark, n, base).write.mode("overwrite").parquet(s"$root/users")
    println(f"seed+write $n rows: ${(System.nanoTime()-t0)/1e9}%.1f s")
    val users = spark.read.schema(Schemas.users).parquet(s"$root/users")
    t0 = System.nanoTime()
    val active = Ops.exportOrder(Ops.exportProjection(Ops.activeOnly(users)))
    val rows = CsvSink.write(active, s"$root/full_csv", singleFile = false)
    println(f"full export (multi-file CSV) $rows rows: ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val wm = java.sql.Timestamp.valueOf("2026-01-31 00:00:00")
    val inc = Ops.incrementalChanges(users, wm).count()
    println(f"incremental count since wm ($inc rows): ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
