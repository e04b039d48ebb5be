package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{OperatorQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: one entry per implemented operator (SURVEY §2), each
  * with an ANSI-SQL DuckDB oracle where SQL can express the semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    OperatorQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    OperatorQueries.oracleSql ++ RelationalQueries.oracleSql ++ PipelineQueries.oracleSql
}
