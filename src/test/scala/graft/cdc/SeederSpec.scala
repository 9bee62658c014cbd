package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distribution + determinism contract of the synthetic seeder,
  * mirroring the reference generator's documented shape
  * (`/root/reference/app/seed_users.py:19-69`): uniform created_at over
  * the prior 30 days, ~50% rows untouched since insert, ~3%
  * soft-deleted, unique emails. These are the §2 rows (5, 26, 28) the
  * DuckDB oracle can't check — a seeded generator has no SQL oracle —
  * so the bar is asserted here instead.
  */
class SeederSpec extends SparkSpec {

  import spark.implicits._

  private val base = Timestamp.valueOf("2026-02-01 00:00:00")
  private val n = 5000L

  private lazy val seeded = Seeder.users(spark, n, base).cache()

  test("seed-stable: two runs produce identical rows") {
    val a = Seeder.users(spark, 500, base).collect().toSet
    val b = Seeder.users(spark, 500, base).collect().toSet
    assert(a == b)
    // and a different seed actually changes the draws
    val c = Seeder.users(spark, 500, base, seed = 7L).collect().toSet
    assert(c != a)
  }

  test("ids 1..n, emails unique, names drawn from the pools") {
    assert(seeded.count() == n)
    assert(seeded.agg(countDistinct($"email")).as[Long].head() == n)
    assert(seeded.agg(min($"id"), max($"id")).as[(Long, Long)].head() == ((1L, n)))
    val badNames = seeded.filter(!split($"name", " ")(0)
      .isin(Seeder.NamePool.map(lit(_)): _*)).count()
    assert(badNames == 0)
  }

  test("timestamp invariants hold on every row") {
    val floor = Timestamp.valueOf("2026-01-02 00:00:00") // base - 30d
    val violations = seeded.filter(
      $"created_at" > $"updated_at" ||
        $"updated_at" > lit(base) ||
        $"created_at" < lit(floor)).count()
    assert(violations == 0)
  }

  test("distributions match the reference shape: ~50% unchanged, ~3% deleted") {
    val stats = seeded.agg(
      avg(when($"created_at" === $"updated_at", 1.0).otherwise(0.0))
        .as("unchanged_frac"),
      avg(when($"is_deleted", 1.0).otherwise(0.0)).as("deleted_frac"),
      // created_at uniform over 30 days -> mean offset ~15 days back
      avg(unix_timestamp(lit(base)) - unix_timestamp($"created_at"))
        .as("mean_age_sec")).as[(Double, Double, Double)].head()
    assert(stats._1 > 0.45 && stats._1 < 0.56, s"unchanged ${stats._1}")
    assert(stats._2 > 0.01 && stats._2 < 0.06, s"deleted ${stats._2}")
    val meanDays = stats._3 / 86400.0
    assert(meanDays > 12 && meanDays < 18, s"mean created age $meanDays d")
  }
}
