package graft

import graft.conditions.Condition._
import graft.operators.{Stateless, Windows}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 minimum end-to-end slice) on sf0.001,
    * declared as IR and interpreted by the engine — the product path:
    * `where [:> :metric 100] → fixed-time-window 1h → coll-count →
    * with :state "critical" → tap`. The interpreter emits the same plan as
    * hand-written DataFrame code (filter pushed to the parquet scan, one
    * shuffle on the window key, map-side combine).
    */
  def entry(spark: SparkSession): DataFrame = {
    val pipeline = graft.ir.Node.fromJson(
      """{"action":"where","params":[[">","metric",100]],"children":[
        |  {"action":"fixed-time-window","params":[{"duration":3600}],"children":[
        |    {"action":"coll-count","children":[
        |      {"action":"with","params":[{"state":"critical"}],"children":[
        |        {"action":"tap","params":["alerts"]}]}]}]}]}""".stripMargin)
    graft.ir.Engine
      .run(pipeline, Tables.events(spark, "/root/testdata/sf0.001"),
        graft.ir.EngineCtx(testMode = true))
      .taps("alerts")
      .select(col("window_start"), col("metric").cast("long").as("n"), col("state"))
      .orderBy("window_start")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
