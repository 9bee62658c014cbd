package graft.plans

import java.time.{Instant, LocalDate, ZoneId}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Cast, TruncTimestamp}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.SparkSpec
import graft.cdc.Compaction

/** [[TimePredicateRewrite]]: `CAST(ts AS DATE) op d` and
  * `date_trunc(u, ts) op v` rewrite to EXACT raw-column ranges — every
  * case is checked for value equivalence against a driver-side
  * java.time recompute (independent of Spark's evaluation path), the
  * rewrite itself is asserted on the optimized plan, and the ranges
  * compose with [[MergePruning]]'s `_tp` pruning.
  */
class TimePredicateRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val added = Seq(TimePredicateRewrite, MergePruning)
      .filterNot(spark.experimental.extraOptimizations.contains)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ added
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(added.contains)
  }

  /** Minute-grid timestamps crossing day / month / DST boundaries. */
  private lazy val data: DataFrame = {
    val starts = Seq(
      "2024-01-09T22:00:00Z", // plain day boundary
      "2024-01-31T22:00:00Z", // month boundary
      "2024-03-10T05:00:00Z", // US spring-forward (07:00 UTC in NY)
      "2024-11-03T04:00:00Z") // US fall-back
    starts.flatMap { s =>
      val t0 = Instant.parse(s)
      (0 until 300).map(m => t0.plusSeconds(m * 67L)) // ~5.5h, off-grid
    }.map(java.sql.Timestamp.from).toDF("ts")
  }

  private def instants: Seq[Instant] =
    data.collect().map(_.getTimestamp(0).toInstant).toSeq

  private def truncDay(i: Instant, z: ZoneId): Instant =
    i.atZone(z).toLocalDate.atStartOfDay(z).toInstant
  private def truncHour(i: Instant, z: ZoneId): Instant =
    i.atZone(z).truncatedTo(java.time.temporal.ChronoUnit.HOURS).toInstant
  private def truncMonth(i: Instant, z: ZoneId): Instant =
    i.atZone(z).toLocalDate.withDayOfMonth(1).atStartOfDay(z).toInstant

  /** Count rows matching `pred` in Spark vs the driver-side oracle;
    * `mustRewrite` additionally pins that no day-cast / trunc node
    * survives in the optimized filter.
    */
  private def check(pred: Column, oracle: Instant => Boolean,
      mustRewrite: Boolean = true): Unit = withRule {
    val df = data.filter(pred)
    val expected = instants.count(oracle)
    assert(df.count() == expected.toLong, s"pred ${pred.toString}")
    if (mustRewrite) {
      val shapes = df.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition.collect {
          case c: Cast if c.dataType == DateType => c
          case t: TruncTimestamp => t
        }
      }.flatten
      assert(shapes.isEmpty,
        s"shape survived the rewrite for ${pred.toString}: $shapes")
    }
  }

  test("CAST(ts AS DATE) comparisons are exact raw ranges (UTC)") {
    val z = ZoneId.of("UTC")
    val d = LocalDate.parse("2024-03-10")
    def day(i: Instant) = i.atZone(z).toLocalDate
    check(col("ts").cast("date") === lit(java.sql.Date.valueOf(d)),
      i => day(i) == d)
    check(col("ts").cast("date") >= lit(java.sql.Date.valueOf(d)),
      i => !day(i).isBefore(d))
    check(col("ts").cast("date") > lit(java.sql.Date.valueOf(d)),
      i => day(i).isAfter(d))
    check(col("ts").cast("date") <= lit(java.sql.Date.valueOf(d)),
      i => !day(i).isAfter(d))
    check(col("ts").cast("date") < lit(java.sql.Date.valueOf(d)),
      i => day(i).isBefore(d))
    // reversed operand order
    check(lit(java.sql.Date.valueOf(d)) <= col("ts").cast("date"),
      i => !day(i).isBefore(d))
  }

  test("date_trunc comparisons: aligned and unaligned bounds, " +
      "day/month/hour units") {
    val z = ZoneId.of("UTC")
    def t(s: String) = Instant.parse(s)
    def lit0(s: String) =
      lit(java.sql.Timestamp.from(t(s)))
    // aligned day equality
    check(date_trunc("day", col("ts")) === lit0("2024-03-10T00:00:00Z"),
      i => truncDay(i, z) == t("2024-03-10T00:00:00Z"))
    // aligned month >= (the dashboard quarter filter)
    check(date_trunc("month", col("ts")) >= lit0("2024-02-01T00:00:00Z"),
      i => !truncMonth(i, z).isBefore(t("2024-02-01T00:00:00Z")))
    // UNALIGNED bounds: floor/ceiling must land on the right side
    check(date_trunc("month", col("ts")) >= lit0("2024-01-15T00:00:00Z"),
      i => !truncMonth(i, z).isBefore(t("2024-01-15T00:00:00Z")))
    check(date_trunc("day", col("ts")) <= lit0("2024-03-10T11:30:00Z"),
      i => !truncDay(i, z).isAfter(t("2024-03-10T11:30:00Z")))
    check(date_trunc("day", col("ts")) < lit0("2024-03-10T11:30:00Z"),
      i => truncDay(i, z).isBefore(t("2024-03-10T11:30:00Z")))
    check(date_trunc("hour", col("ts")) > lit0("2024-11-03T04:00:00Z"),
      i => truncHour(i, z).isAfter(t("2024-11-03T04:00:00Z")))
    // unaligned equality matches nothing and is left UNrewritten
    // (FALSE would break null semantics) — values must still agree
    check(date_trunc("month", col("ts")) === lit0("2024-01-15T00:00:00Z"),
      i => truncMonth(i, z) == t("2024-01-15T00:00:00Z"),
      mustRewrite = false)
  }

  test("year(ts) comparisons compose through the cast-date rewrite " +
      "down to the raw column") {
    val z = ZoneId.of("UTC")
    def yearOf(i: Instant) = i.atZone(z).getYear
    // year(ts) analyzes to Year(Cast(ts AS DATE)): the year rewrite
    // emits a date range on the cast, the cast rewrite then emits a
    // timestamp range on ts — fixed point bottoms out raw
    check(year(col("ts")) === lit(2024), i => yearOf(i) == 2024)
    check(year(col("ts")) >= lit(2025), i => yearOf(i) >= 2025)
    check(year(col("ts")) < lit(2024), i => yearOf(i) < 2024)
    // the composed plan carries neither Year nor the day cast
    withRule {
      val df = data.filter(year(col("ts")) === lit(2024))
      val leftovers = df.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition.collect {
          case y: org.apache.spark.sql.catalyst.expressions.Year => y
          case c: Cast if c.dataType == DateType => c
        }
      }.flatten
      assert(leftovers.isEmpty, s"shapes survived: $leftovers")
    }
  }

  test("composed year+month / +day / +quarter conjunctions tighten " +
      "to one exact raw range") {
    val z = ZoneId.of("UTC")
    def ld(i: Instant) = i.atZone(z).toLocalDate
    // year+month — the BI month filter (January AND March: the data's
    // DST block is in March, the month boundary block in January)
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1),
      i => ld(i).getYear == 2024 && ld(i).getMonthValue == 1)
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(3),
      i => ld(i).getYear == 2024 && ld(i).getMonthValue == 3)
    // year+month+day bottoms out at ONE day
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1) &&
        dayofmonth(col("ts")) === lit(10),
      i => ld(i) == LocalDate.of(2024, 1, 10))
    // year+quarter
    check(year(col("ts")) === lit(2024) && quarter(col("ts")) === lit(4),
      i => ld(i).getYear == 2024 && (ld(i).getMonthValue - 1) / 3 == 3)
    // extra conjuncts ride along untouched
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1) &&
        col("ts").isNotNull,
      i => ld(i).getYear == 2024 && ld(i).getMonthValue == 1)
    // the composed plan carries no Year/Month/DayOfMonth/cast shapes
    withRule {
      val df = data.filter(
        year(col("ts")) === lit(2024) && month(col("ts")) === lit(1))
      val leftovers = df.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition.collect {
          case y: org.apache.spark.sql.catalyst.expressions.Year => y
          case m: org.apache.spark.sql.catalyst.expressions.Month => m
          case c: Cast if c.dataType == DateType => c
        }
      }.flatten
      assert(leftovers.isEmpty, s"shapes survived: $leftovers")
    }
  }

  test("composed-shape declines: out-of-range, nonexistent dates, " +
      "contradictions, null propagation") {
    val z = ZoneId.of("UTC")
    def ld(i: Instant) = i.atZone(z).toLocalDate
    // month 13 matches nothing; must DECLINE (FALSE would break null
    // semantics), values still agree
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(13),
      _ => false, mustRewrite = false)
    // Feb 30 does not exist
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(2) &&
        dayofmonth(col("ts")) === lit(30),
      _ => false, mustRewrite = false)
    // contradictory month legs decline; identical duplicates compose
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1) &&
        month(col("ts")) === lit(2),
      _ => false, mustRewrite = false)
    check(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1) &&
        month(col("ts")) === lit(1),
      i => ld(i).getYear == 2024 && ld(i).getMonthValue == 1)
    // day without month cannot compose (day d of EVERY month); the
    // year leg still rewrites alone — values must agree
    check(year(col("ts")) === lit(2024) &&
        dayofmonth(col("ts")) === lit(10),
      i => ld(i).getYear == 2024 && ld(i).getDayOfMonth == 10,
      mustRewrite = false)
    // null rows stay NULL under negation: a null ts matches neither
    // the composed conjunction nor its negation
    withRule {
      val withNull = data.union(
        Seq(Option.empty[java.sql.Timestamp]).toDF("ts"))
      val pos = withNull.filter(
        year(col("ts")) === lit(2024) && month(col("ts")) === lit(1))
      val neg = withNull.filter(
        !(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1)))
      assert(pos.count() + neg.count() == data.count(),
        "the null row must match neither side")
    }
  }

  test("composed year+month prunes a months-partitioned table to " +
      "one _tp dir") {
    val dir = tmpDir("tpr-prune-month") + "/t"
    def ts(month: Int, d: Int) =
      java.sql.Timestamp.valueOf(f"2024-$month%02d-$d%02d 12:00:00")
    Compaction.init(
      (1L to 120L).map(i =>
          (i, s"v-$i", ts(1 + ((i - 1) % 6).toInt, 1 + (i % 27).toInt),
            0L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 4,
      clusterBy = Nil, feed = false,
      timePartition = Some("months" -> "ts"))
    withRule {
      Compaction.read(spark, dir).createOrReplaceTempView("tpr_m")
      val df = spark.sql(
        "SELECT id FROM tpr_m WHERE year(ts) = 2024 AND month(ts) = 2")
      val expect = (1L to 120L).filter(i => 1 + ((i - 1) % 6) == 2).toSet
      assert(df.as[Long].collect().toSet == expect)
      // 2024-02 = 54*12 + 1 = month index 649 since epoch
      val opened = df.inputFiles.toSet
      assert(opened.nonEmpty && opened.forall(_.contains("_tp=649")),
        s"composed year+month must prune to one _tp dir:\n" +
          opened.mkString("\n"))
    }
  }

  test("session-zone day boundaries hold across DST (America/New_York)") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val z = ZoneId.of("America/New_York")
      // spring-forward day: 23 wall-clock hours
      val d = LocalDate.parse("2024-03-10")
      check(col("ts").cast("date") === lit(java.sql.Date.valueOf(d)),
        i => i.atZone(z).toLocalDate == d)
      // trunc-day >= across the fall-back day (25 hours)
      val cut = LocalDate.parse("2024-11-03").atStartOfDay(z).toInstant
      check(date_trunc("day", col("ts")) >=
          lit(java.sql.Timestamp.from(cut)),
        i => !truncDay(i, z).isBefore(cut))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("rewritten day-cast predicate prunes _tp partition dirs " +
      "through MergePruning") {
    val dir = tmpDir("tpr-prune") + "/t"
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    Compaction.init(
      (1L to 100L).map(i =>
          (i, s"v-$i", ts(1 + ((i - 1) % 10).toInt, (i % 24).toInt),
            0L, false))
        .toDF("id", "payload", "ts", "version", "deleted"),
      dir, Seq("id"), "version", "deleted", nBuckets = 4,
      clusterBy = Nil, feed = false,
      timePartition = Some("days" -> "ts"))
    withRule {
      Compaction.read(spark, dir).createOrReplaceTempView("tpr_t")
      // 2024-01-03 = epoch day 19725
      val df = spark.sql(
        "SELECT id FROM tpr_t WHERE CAST(ts AS DATE) = DATE '2024-01-03'")
      val expect = (1L to 100L)
        .filter(i => 1 + ((i - 1) % 10) == 3).toSet
      assert(df.as[Long].collect().toSet == expect)
      val opened = df.inputFiles.toSet
      assert(opened.nonEmpty && opened.forall(_.contains("_tp=19725")),
        s"day-cast predicate must prune to one _tp dir:\n" +
          opened.mkString("\n"))
    }
  }
}
