package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `users` generator mirroring the reference
  * seeder's distributions (`/root/reference/app/seed_users.py:19-69`):
  *
  *  - `created_at` uniform over the 30 days before `base` (`:48`)
  *  - 50% of rows have `updated_at == created_at` (INSERT-classified,
  *    `:49-50`)
  *  - else `updated_at = created_at + U(0..3d, 0..23h, 0..59m)` clamped
  *    to `base` (`:51-58`)
  *  - 3% soft-deleted (`:61`)
  *  - unique emails (the reference relies on Faker uniqueness + an
  *    `ON CONFLICT (email) DO NOTHING` guard, `:39-43`; we derive the
  *    email from the id, which is unique by construction)
  *
  * Fully distributed and seed-stable: `spark.range` + `rand(seed)`
  * column expressions — no driver-side loop, no `Math.random`. Generating
  * 10^11 rows is the same plan as 10^5, partitioned by the range source.
  */
object Seeder {

  val NamePool: Seq[String] = Seq(
    "Alex", "Bailey", "Casey", "Devon", "Emery", "Finley", "Gray",
    "Harper", "Indigo", "Jules", "Kai", "Logan", "Morgan", "Noor",
    "Oakley", "Parker", "Quinn", "Reese", "Sage", "Tatum")

  val SurnamePool: Seq[String] = Seq(
    "Adams", "Baker", "Chen", "Diaz", "Evans", "Foster", "Garcia",
    "Hughes", "Ivanov", "Jones", "Khan", "Lopez", "Murphy", "Nguyen",
    "Ortiz", "Patel", "Quirke", "Rossi", "Singh", "Tanaka")

  /** Generate `n` users with ids 1..n. `base` plays the role of the
    * seeder's `datetime.now()` (`seed_users.py:34`) so runs are
    * reproducible.
    */
  def users(spark: SparkSession, n: Long, base: Timestamp,
      seed: Long = 42L): DataFrame = {
    val nameArr = array(NamePool.map(lit): _*)
    val surnameArr = array(SurnamePool.map(lit): _*)
    val baseCol = lit(base)

    spark.range(1, n + 1)
      .withColumnRenamed("id", "id")
      // independent uniform draws per row, seed-stable
      .withColumn("u_created", rand(seed))
      .withColumn("u_unchanged", rand(seed + 1))
      .withColumn("u_days", rand(seed + 2))
      .withColumn("u_hours", rand(seed + 3))
      .withColumn("u_minutes", rand(seed + 4))
      .withColumn("u_deleted", rand(seed + 5))
      .withColumn("name", concat(
        element_at(nameArr, (pmod(col("id"), lit(NamePool.size)) + 1).cast("int")),
        lit(" "),
        element_at(surnameArr,
          (pmod((col("id") / NamePool.size).cast("long"),
            lit(SurnamePool.size)) + 1).cast("int"))))
      .withColumn("email", concat(lit("user"), col("id"), lit("@example.com")))
      // created_at = base - U(0, 30d)  (seed_users.py:48)
      .withColumn("created_at", timestamp_add(
        "SECOND", -(col("u_created") * lit(30L * 24 * 3600)).cast("long"), baseCol))
      // 50%: updated == created; else created + U(0..3d,0..23h,0..59m),
      // clamped to base (seed_users.py:49-58)
      .withColumn("updated_at",
        when(col("u_unchanged") < 0.5, col("created_at"))
          .otherwise(least(baseCol, timestamp_add("SECOND",
            (col("u_days") * 4).cast("long") * 86400L +
              (col("u_hours") * 24).cast("long") * 3600L +
              (col("u_minutes") * 60).cast("long") * 60L,
            col("created_at")))))
      .withColumn("is_deleted", col("u_deleted") < 0.03)
      .select("id", "name", "email", "created_at", "updated_at", "is_deleted")
  }
}
