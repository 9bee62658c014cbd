package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true` the
    * column arrives as LongType (ns since epoch); convert to a µs
    * TimestampType with integral division (ns epoch values exceed 2^53,
    * so double division would corrupt them).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsSince(spark, sfDir, None)

  /** Events with the CDC range predicate applied BEFORE the ns→µs
    * conversion, i.e. on the raw int64 — so it reaches the parquet scan
    * as a pushed filter and prunes row groups by min/max stats (the
    * Spark analog of the reference's `idx_users_updated_at` B-tree,
    * SURVEY.md §4). Filtering the converted column instead would hide
    * the predicate behind `timestamp_micros(ts div 1000)` and force a
    * full scan.
    */
  def eventsSince(spark: SparkSession, sfDir: String,
      tsAfter: Option[java.sql.Timestamp]): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val filtered = tsAfter match {
          case Some(wm) => raw.filter(col("ts") > lit(wm.getTime * 1000000L))
          case None => raw
        }
        filtered.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        tsAfter match {
          case Some(wm) => raw.filter(col("ts") > lit(wm))
          case None => raw
        }
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
