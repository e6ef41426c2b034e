package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain query modules under graft.queries;
  * each entry has a matching DuckDB oracle in `oracleSql` (column names are
  * aligned on both sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The MainEventsView spine: scan → not-null filter → project → agg. */
  def entry(spark: SparkSession): DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.AggregateQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.EvalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.AggregateQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.EvalQueries.oracles
}
