package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/expectations
  * pattern): declare constraints against a table, get back one row
  * per constraint with its exact violation count.
  *
  * Scale shape: every ROW-LOCAL check (non-null, range, accepted
  * values, custom predicate) folds into ONE conditional-sum aggregate
  * over a single scan — adding a check adds a column to the agg, not
  * a pass over the data. Uniqueness is one map-side-combined groupBy
  * per key set (violations = rows in groups of >1); referential
  * integrity is one left_anti against the (deduplicated) dimension
  * keys — broadcast while the dimension fits, shuffled otherwise,
  * Catalyst's call. Results UNION into the report frame; the report
  * is |checks| rows regardless of table size.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Row-local predicate that must hold on every row. */
  final case class Predicate(name: String, holds: Column) extends Check

  /** `cols` together identify a row at most once. */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** Every non-null value of `col` exists in `dimKey` of `dim`. */
  final case class ForeignKey(name: String, col: String, dim: DataFrame,
      dimKey: String) extends Check

  def notNull(c: String): Check = Predicate(s"not_null($c)", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Check =
    Predicate(s"in_range($c)",
      col(c).isNotNull && col(c) >= lo && col(c) <= hi)

  def acceptedValues(c: String, vs: Seq[String]): Check =
    Predicate(s"accepted_values($c)",
      col(c).isNotNull && col(c).isin(vs: _*))

  /** One report row per check: (check, n_violations, pass). Ordered
    * by check name for deterministic output.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._

    val preds = checks.collect { case p: Predicate => p }
    val predReport: Option[DataFrame] =
      if (preds.isEmpty) None
      else {
        val aggs = preds.map(p =>
          sum(when(!coalesce(p.holds, lit(false)), 1L).otherwise(0L))
            .as(p.name))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        Some(preds.zipWithIndex.map { case (p, i) =>
          (p.name, row.getLong(i))
        }.toDF("check", "n_violations"))
      }

    val uniqueReports = checks.collect { case u: Unique =>
      df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
        .select(lit(u.name).as("check"), col("n_violations"))
    }

    val fkReports = checks.collect { case f: ForeignKey =>
      df.filter(col(f.col).isNotNull)
        .join(f.dim.select(col(f.dimKey).as(f.col)).distinct(),
          Seq(f.col), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(f.name).as("check"), col("n_violations"))
    }

    (predReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check"))
  }
}
