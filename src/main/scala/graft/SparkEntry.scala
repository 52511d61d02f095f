package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2): one entry per
  * implemented operator, each with a DuckDB oracle in [[oracleSql]] unless
  * the operator isn't SQL-expressible (then the driver records a rows-only
  * check). The per-domain corpora live in `graft.queries.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + aggregate: revenue per nation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.FunctionQueries.queries ++
      graft.queries.OpsQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.VectorQueries.oracle ++
      graft.queries.StreamQueries.oracle ++
      graft.queries.FunctionQueries.oracle ++
      graft.queries.OpsQueries.oracle
}
