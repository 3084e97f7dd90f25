package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-certifying query names to DataFrame-API
  * implementations; `oracleSql` carries the equivalent DuckDB SQL for the
  * driver's hash compare. Keys present in `queries` but absent from
  * `oracleSql` get a weaker rows-only check (non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped aggregation battery (SURVEY Q16).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_agg_battery")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Declared.queries ++ graft.queries.Capability.queries ++
      graft.queries.Round4.queries ++ graft.queries.Round8.queries ++
      graft.queries.Round9.queries ++ graft.queries.Round10.queries ++
      graft.queries.Round11.queries ++ graft.queries.Round12.queries ++
      graft.queries.Round13.queries ++ graft.queries.Round14.queries ++
      graft.queries.Round15.queries ++ graft.queries.Round16.queries ++
      graft.queries.Round17.queries ++
      graft.ext.Extensions.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Declared.oracleSql ++ graft.queries.Capability.oracleSql ++
      graft.queries.Round4.oracleSql ++ graft.queries.Round8.oracleSql ++
      graft.queries.Round9.oracleSql ++ graft.queries.Round10.oracleSql ++
      graft.queries.Round11.oracleSql ++ graft.queries.Round12.oracleSql ++
      graft.queries.Round13.oracleSql ++ graft.queries.Round14.oracleSql ++
      graft.queries.Round15.oracleSql ++ graft.queries.Round16.oracleSql ++
      graft.queries.Round17.oracleSql ++
      graft.ext.Extensions.oracleSql
}
