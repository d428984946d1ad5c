package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure payload formatters for the reference's outbound integrations
  * (SURVEY §2.7 sinks). The HTTP/client halves are deliberately out of
  * scope (no network here); these produce the exact wire payloads as
  * columns, so a `foreachBatch` + any HTTP client is the only thing a
  * deployment adds. All Column algebra — formatting fuses into the plan.
  */
object Encode {

  /** PagerDuty v2 request bodies
    * (`/root/reference/src/clojure/mirabelle/output/pagerduty.clj:44-111`):
    * one JSON body per event; `event_action` derives from `state`
    * (critical→trigger, ok→resolve, else trigger), severity maps ok→info
    * else the state (default critical), summary joins `summaryKeys` with
    * " - ", dedup key joins `dedupKeys` with "-". The reference reads
    * `:time` as epoch seconds; event time here is ns, converted.
    *
    * Output: the input plus `event_action` and `pd_body` (JSON string).
    */
  def pagerduty(df: DataFrame, routingKey: String, sourceKey: String,
                summaryKeys: Seq[String], dedupKeys: Seq[String]): DataFrame = {
    val action = when(col("state") === "critical", "trigger")
      .when(col("state") === "ok", "resolve")
      .otherwise("trigger")
    val body = to_json(struct(
      lit(routingKey).as("routing_key"),
      col("event_action"),
      concat_ws("-", dedupKeys.map(col): _*).as("dedup_key"),
      struct(
        concat_ws(" - ", summaryKeys.map(col): _*).as("summary"),
        col(sourceKey).as("source"),
        when(col("state") === "ok", "info")
          .otherwise(coalesce(col("state"), lit("critical"))).as("severity"),
        date_format(timestamp_seconds(expr("time div 1000000000")),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
        struct(df.columns.map(col): _*).as("custom_details")
      ).as("payload")))
    df.withColumn("event_action", action).withColumn("pd_body", body)
  }

  /** Elasticsearch `_bulk` lines
    * (`output/elasticsearch.clj:125-150`): per event an action line naming
    * the (optionally date-suffixed) index and a source line with `@timestamp`
    * instead of `time`. Output column `bulk` holds both lines,
    * newline-terminated; `concat_ws("", collect_list(bulk))` (or a text
    * sink) yields the request body.
    */
  def elasticsearchBulk(df: DataFrame, index: String,
                        datePattern: Option[String] = Some("yyyy-MM-dd")): DataFrame = {
    val ts = timestamp_seconds(expr("time div 1000000000"))
    val idx = datePattern match {
      case Some(p) => concat(lit(index), lit("-"), date_format(ts, p))
      case None    => lit(index)
    }
    val source = to_json(struct(
      (df.columns.filterNot(_ == "time").map(col) :+
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("@timestamp")): _*))
    df.withColumn("bulk",
      concat(lit("{\"index\":{\"_index\":\""), idx, lit("\"}}\n"), source, lit("\n")))
  }

  /** Events → Prometheus remote-write series
    * (`prometheus.clj:32-58` `events->write-request`): the exact inverse of
    * [[graft.sources.Decode.prometheusWrite]] — events grouped by
    * (name, attributes) become one timeseries each, labels =
    * `__name__` + attributes, samples = (metric, ns→ms). One shuffle on
    * the series key with map-side combine; wire batching (the reference's
    * 1000-events/5-s flush) is the micro-batch trigger's job.
    */
  def prometheusSeries(df: DataFrame): DataFrame =
    df.groupBy(col("name"), col("attributes"))
      .agg(collect_list(struct(
        col("metric").as("value"),
        expr("time div 1000000").as("timestamp"))).as("samples"))
      .select(struct(
        concat(
          array(struct(lit("__name__").as("name"), col("name").as("value"))),
          transform(map_entries(col("attributes")),
            e => struct(e.getField("key").as("name"), e.getField("value").as("value"))))
          .as("labels"),
        col("samples")).as("series"))

  /** Wrap encoded series into WriteRequest rows of at most `seriesPerRequest`
    * timeseries (the decode-compatible shape). Requests never span source
    * partitions (`monotonically_increasing_id` embeds the partition id), so
    * batching needs no global ordering — some requests are smaller, none
    * larger, and the plan stays shuffle-light at any scale.
    */
  def prometheusWriteRequests(series: DataFrame, seriesPerRequest: Int = 500): DataFrame =
    series
      .withColumn("__grp", expr(s"monotonically_increasing_id() div $seriesPerRequest"))
      .groupBy("__grp")
      .agg(collect_list(col("series")).as("timeseries"))
      .drop("__grp")
}
