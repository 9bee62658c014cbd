package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sweep-line open count must equal the definitional containment
  * count |{i : start_i <= d <= end_i}| at every change day — including
  * nested, disjoint, adjacent, single-day, and duplicate intervals —
  * and must be invariant to the shard split (prefix sums chain across
  * shard boundaries through GlobalRank).
  */
class IntervalSweepSpec extends SparkSpec {

  import spark.implicits._

  private val intervals = Seq(
    // nested               disjoint           adjacent (end+1 = start)
    ("2020-01-01", "2020-03-01"), ("2020-05-10", "2020-05-12"),
    ("2020-01-10", "2020-01-20"), ("2020-05-13", "2020-05-20"),
    // single-day, duplicate pair, year-boundary spanner
    ("2020-02-15", "2020-02-15"), ("2020-02-15", "2020-02-15"),
    ("2020-12-20", "2021-01-10"),
  ).map { case (s, e) => (Date.valueOf(s), Date.valueOf(e)) }
    .toDF("start_day", "end_day")

  private def brute = {
    val days = intervals
      .select(col("start_day").as("day"))
      .unionAll(intervals.select(date_add(col("end_day"), 1).as("day")))
      .distinct()
    days.join(intervals,
        col("start_day") <= col("day") && col("day") <= col("end_day"),
        "left")
      .groupBy(col("day"))
      .agg(sum(when(col("start_day").isNotNull, 1L).otherwise(0L))
        .as("n_open"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
  }

  test("open counts == containment counts at every change day") {
    val expected = brute
    for (shardFn <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        _ => lit(0), d => year(d), d => year(d) * 12 + month(d))) {
      val got = IntervalSweep
        .openCounts(intervals, "start_day", "end_day", shardFn)
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("weighted sweep: open sums == containment sums (exact longs)") {
    val weighted = intervals.withColumn("w",
      (length(col("start_day").cast("string")) +
        dayofmonth(col("end_day"))).cast("long"))
    val expected = {
      val days = weighted
        .select(col("start_day").as("day"))
        .unionAll(weighted.select(date_add(col("end_day"), 1).as("day")))
        .distinct()
      days.join(weighted,
          col("start_day") <= col("day") && col("day") <= col("end_day"),
          "left")
        .groupBy(col("day"))
        .agg(sum(when(col("w").isNotNull, 1L).otherwise(0L)).as("n"),
          coalesce(sum(col("w")), lit(0L)).as("s"))
        .collect()
        .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
        .toMap
    }
    val got = IntervalSweep
      .openAggregates(weighted, "start_day", "end_day", col("w"),
        d => year(d))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expected)
  }

  test("every change day present; counts return to zero past the end") {
    val rows = IntervalSweep
      .openCounts(intervals, "start_day", "end_day", d => year(d))
      .orderBy(col("day"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1))
    assert(rows.map(_._1).contains("2021-01-11")) // last end + 1
    assert(rows.last == ("2021-01-11" -> 0L))
    val m = rows.toMap
    // nested peak: Jan 10-20 has both the outer and the inner open
    assert(m("2020-01-10") == 2L)
    // duplicates both count
    assert(m("2020-02-15") == 3L) // outer + the two dups
  }
}
