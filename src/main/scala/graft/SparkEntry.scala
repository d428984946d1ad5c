package graft

import graft.conditions.Condition._
import graft.operators.{Stateless, Windows}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 minimum end-to-end slice) on sf0.001:
    * `where [:> :metric 100] → fixed-time-window 1h → coll-count →
    * with :state "critical"` — filter pushed to the parquet scan, one
    * shuffle on the window key, payload aggregated with map-side combine.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001")
      .transform(Stateless.where(Gt(Field("metric"), 100)))
      .transform(Windows.fixedTimeWindow(3600))
      .select(col("window_start"), size(col("events")).cast("long").as("n"))
      .transform(Stateless.withFields(Map("state" -> "critical")))
      .orderBy("window_start")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
