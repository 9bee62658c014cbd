package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BagDistanceExpr: native L1 over int count arrays, pinned identical
  * to the declarative zip_with fold (repo rule: every native kernel
  * has a declarative twin it must match exactly), plus the edit-
  * distance lower-bound property it exists to enforce.
  */
class BagDistanceExprSpec extends SparkSpec {

  import spark.implicits._

  test("native L1 == declarative zip_with fold, all shapes") {
    val rows = Seq(
      (Seq(1, 2, 3), Seq(1, 2, 3)),
      (Seq(0, 5, 0), Seq(3, 0, 2)),
      (Seq(7), Seq(1, 2, 3)),          // unequal length: tail full weight
      (Seq.empty[Int], Seq(4, 4)),
      (Seq(1000000, 0), Seq(0, 1000000)))
      .toDF("a", "b")
    val got = rows.select(
      BagDistanceExpr.bagL1($"a", $"b").as("native"),
      (aggregate(zip_with($"a", $"b", (x, y) =>
          abs(coalesce(x, lit(0)) - coalesce(y, lit(0)))),
        lit(0), (acc, v) => acc + v) +
        // zip_with stops at... no: it null-extends to the LONGER side,
        // so the fold above already covers the tail
        lit(0)).as("declarative"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"native ${r.getInt(0)} != declarative ${r.getInt(1)}"))
  }

  test("letter-bag L1 lower-bounds edit distance (the prefilter contract)") {
    // histogram over a-z of a string, as the query builds it
    def sig(s: String): Seq[Int] =
      ('a' to 'z').map(ch => s.count(_ == ch))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    def l1(x: Seq[Int], y: Seq[Int]): Int =
      x.zip(y).map { case (p, q) => math.abs(p - q) }.sum
    val cases = Seq(
      ("kitten", "sitting"), ("abcdef", "abcdef"), ("aaaa", "zzzz"),
      ("the quick brown fox", "the quick brown dog"),
      ("abc", "cba"), ("", "hello"))
    cases.foreach { case (x, y) =>
      assert(l1(sig(x), sig(y)) <= 2 * lev(x, y),
        s"lower bound violated for ($x, $y)")
    }
  }
}
