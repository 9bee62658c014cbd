package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CdcQueries, EmbeddingQueries, ExtensionQueries, PipelineQueries, RelationalQueries, TextQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the operator inventory (SURVEY.md §2) plus the
  * training-data-pipeline extensions, one entry per operator, each with
  * a DuckDB oracle in `oracleSql` (column names aliased identically on
  * both sides; deterministic ORDER BY with unique tiebreakers).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ EmbeddingQueries.queries ++
      ExtensionQueries.queries ++ PipelineQueries.queries ++
      TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracle ++ RelationalQueries.oracle ++
      TextQueries.oracle ++ EmbeddingQueries.oracle ++
      PipelineQueries.oracle ++ TpchQueries.oracle
}
