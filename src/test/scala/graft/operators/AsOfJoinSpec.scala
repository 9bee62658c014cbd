package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join matches brute-force reference on random data") {
    val rnd = new scala.util.Random(11)
    def randTs() = new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L)
    val left = (1L to 200L).map(i => (i, s"k${rnd.nextInt(5)}", randTs()))
    val right = (1000L to 1100L).map(i => (i, s"k${rnd.nextInt(5)}", randTs(), rnd.nextDouble()))
    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("rid", "k", "rt", "v")

    val got = AsOfJoin.asofJoin(lDf, rDf, Seq("k"), "t", "rt", Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    // brute force: latest right at-or-before, max rid as tiebreak is not
    // needed (timestamps unique w.h.p.; assert on ts equality instead)
    val rByKey = right.groupBy(_._2)
    left.foreach { case (lid, k, t) =>
      val cands = rByKey.getOrElse(k, Seq.empty)
        .filter(!_._3.after(t))
      if (cands.isEmpty) assert(got(lid) == -1L, s"lid $lid expected null")
      else {
        val bestTs = cands.map(_._3.getTime).max
        val bestIds = cands.filter(_._3.getTime == bestTs).map(_._1).toSet
        assert(bestIds.contains(got(lid)),
          s"lid $lid got ${got(lid)} expected one of $bestIds")
      }
    }
  }

  test("forward direction picks earliest right at-or-after, inclusive") {
    val trades = Seq(
      (1L, "A", ts("2026-01-01 10:00:05")), // next quote at 10:00:20
      (2L, "A", ts("2026-01-01 10:00:20")), // exactly at a quote -> it
      (3L, "A", ts("2026-01-01 10:00:30")), // nothing after -> null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (101L, "A", ts("2026-01-01 10:00:00"), 10.0),
      (103L, "A", ts("2026-01-01 10:00:20"), 12.0),
    ).toDF("quote_id", "sym", "qt", "px")
    val res = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      Seq("quote_id"), forward = true)
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(res(1L).contains(103L))
    assert(res(2L).contains(103L))
    assert(res(3L).isEmpty)
  }

  test("nearest direction picks the closer side, earlier on ties") {
    val trades = Seq(
      (1L, "A", ts("2026-01-01 10:00:06")), // 6s after q101, 14s before q103
      (2L, "A", ts("2026-01-01 10:00:15")), // 15s after q101, 5s before q103
      (3L, "A", ts("2026-01-01 10:00:10")), // equidistant -> earlier (q101)
      (4L, "B", ts("2026-01-01 10:00:00")), // only a later quote exists
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (101L, "A", ts("2026-01-01 10:00:00"), 10.0),
      (103L, "A", ts("2026-01-01 10:00:20"), 12.0),
      (104L, "B", ts("2026-01-01 10:05:00"), 20.0),
    ).toDF("quote_id", "sym", "qt", "px")
    val res = AsOfJoin.asofJoinNearest(trades, quotes, Seq("sym"), "t", "qt",
      Seq("quote_id"))
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(res(1L).contains(101L))
    assert(res(2L).contains(103L))
    assert(res(3L).contains(101L)) // tie -> earlier
    assert(res(4L).contains(104L)) // forward-only match
  }

  test("maxGap tolerance: stale matches are nulled, fresh ones kept") {
    import org.apache.spark.sql.functions.expr
    val trades = Seq(
      (1L, "A", ts("2026-01-01 10:00:05")), // 5s after quote -> kept
      (2L, "A", ts("2026-01-01 11:30:00")), // 90min after quote -> nulled
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (101L, "A", ts("2026-01-01 10:00:00"), 10.0),
    ).toDF("quote_id", "sym", "qt", "px")
    val res = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      Seq("quote_id"), maxGap = Some(expr("INTERVAL '30' MINUTE")))
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(res(1L).contains(101L))
    assert(res(2L).isEmpty)
  }

  test("asof join picks latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, "A", ts("2026-01-01 10:00:05")),
      (2L, "A", ts("2026-01-01 10:00:30")),
      (3L, "B", ts("2026-01-01 10:00:10")),
      (4L, "B", ts("2026-01-01 09:59:00")), // before any quote -> null
    ).toDF("trade_id", "sym", "t")
    val quotesDf = Seq(
      (101L, "A", ts("2026-01-01 10:00:00"), 10.0),
      (102L, "A", ts("2026-01-01 10:00:05"), 11.0), // exactly at trade 1 -> eligible
      (103L, "A", ts("2026-01-01 10:00:20"), 12.0),
      (104L, "B", ts("2026-01-01 10:00:01"), 20.0),
    ).toDF("quote_id", "sym", "qt", "px")

    val res = AsOfJoin.asofJoin(trades, quotesDf, Seq("sym"), "t", "qt",
      Seq("quote_id", "px"))
      .select("trade_id", "quote_id", "px")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet

    assert(res == Set(
      (1L, Some(102L), Some(11.0)), // inclusive: quote at same instant
      (2L, Some(103L), Some(12.0)), // latest preceding
      (3L, Some(104L), Some(20.0)),
      (4L, None, None),             // nothing precedes
    ))
  }
}
