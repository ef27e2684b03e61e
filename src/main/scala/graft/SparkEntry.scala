package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY §2
  * (plus the scale-pipeline extensions); `oracleSql` the DuckDB
  * equivalent where SQL-expressible. Column names are aliased
  * identically on both sides; every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship: the stage-wins PK merge (the reference's distinctive
    * semantics, SURVEY §2.3 J3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("upsert_merge")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ AnalyticsQueries.queries ++
      TextQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      TextQueries.oracleSql ++ PipelineQueries.oracleSql
}
