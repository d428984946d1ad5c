package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure event-decode mappings for the ingestion formats (SURVEY §2.7) —
  * the testable core of the reference's sources, without the wire/netty
  * layer (no network in this library; pair with `from_protobuf`/Kafka or
  * JSON sources at the edge).
  *
  * All pure Column algebra: decode pipelines fuse into the scan and
  * explode stages, no shuffles.
  */
object Decode {

  /** Prometheus remote-write → events
    * (`/root/reference/src/clojure/mirabelle/prometheus.clj:11-29`):
    * one event per sample; `__name__` label becomes `name`, the remaining
    * labels become `attributes`, prometheus ms timestamps become ns.
    *
    * Input schema (the protobuf WriteRequest shape after `from_protobuf`):
    * `timeseries: array<struct<labels: array<struct<name, value>>,
    * samples: array<struct<value: double, timestamp: long /*ms*/>>>>`.
    */
  def prometheusWrite(df: DataFrame): DataFrame =
    df.select(explode(col("timeseries")).as("series"))
      .select(
        map_from_entries(col("series.labels")).as("__labels"),
        explode(col("series.samples")).as("sample"))
      .select(
        element_at(col("__labels"), "__name__").as("name"),
        map_filter(col("__labels"), (k, _) => k =!= "__name__").as("attributes"),
        col("sample.value").as("metric"),
        (col("sample.timestamp") * lit(1000000L)).as("time"))

  /** HTTP push API body → events
    * (`/root/reference/src/clojure/mirabelle/handler.clj:51-58`
    * `PUT /api/v1/stream/:name` with `{"events": [...]}`): each element is
    * an event map pushed as-is — `time` is already ns (`time/default-time`
    * only fills in a missing time with the wall clock; a deterministic
    * library leaves absent times null instead).
    *
    * `from_json` + explode: fuses into the scan, no shuffle.
    */
  def httpEvents(df: DataFrame, bodyCol: String = "body"): DataFrame = {
    val eventType =
      "struct<time:bigint,state:string,service:string,host:string," +
        "description:string,tags:array<string>,ttl:double,metric:double," +
        "attributes:map<string,string>>"
    df.select(from_json(col(bodyCol), s"struct<events:array<$eventType>>",
        Map.empty[String, String]).as("__body"))
      // a malformed body parses to NULL; explode_outer keeps one all-null
      // marker row for it instead of silently dropping the payload, so
      // the bad-record pattern (exception-stream on any event field)
      // still sees it — the reference handler rejects such bodies at the
      // HTTP layer
      .select(explode_outer(col("__body.events")).as("e"))
      .select(col("e.*"))
  }

  /** fluentbit JSON logs → events (`handler.clj:89-95`): `date` (seconds,
    * possibly fractional) becomes ns `time`; the log line maps onto
    * `description`.
    */
  def fluentbit(df: DataFrame, dateCol: String = "date", logCol: String = "log"): DataFrame =
    df.withColumn("time", (col(dateCol) * lit(1e9)).cast("long"))
      .withColumnRenamed(logCol, "description")
      .drop(dateCol)

  private def kindName(kind: Column): Column =
    try_element_at(
      array(Seq("unspecified", "internal", "server", "client", "producer", "consumer")
        .map(lit): _*),
      // 1-based; out-of-range yields NULL → coalesce to "unrecognized"
      when(kind >= 0 && kind <= 5, kind.cast("int") + 1).otherwise(lit(100)))

  /** OTLP trace export → span events
    * (`/root/reference/src/clojure/mirabelle/otel/traces.clj:72-135`):
    * span duration becomes `metric`, end time becomes `time`, the status
    * code becomes `state` (error/ok/unset), the resource's `service.name`
    * becomes `service`, kind int becomes its lowercase name.
    *
    * Input schema (ExportTraceServiceRequest shape):
    * `resourceSpans: array<struct<
    *    resource: struct<attributes: array<struct<key, value>>>,
    *    scopeSpans: array<struct<spans: array<struct<
    *      traceId, spanId, parentSpanId, name, kind: long,
    *      startTimeUnixNano, endTimeUnixNano,
    *      status: struct<code: long, message>,
    *      attributes: array<struct<key, value>>>>>>>>`.
    */
  def otlpSpans(df: DataFrame): DataFrame =
    df.select(explode(col("resourceSpans")).as("rs"))
      .select(
        map_from_entries(col("rs.resource.attributes")).as("__res"),
        explode(col("rs.scopeSpans")).as("ss"))
      .select(col("__res"), explode(col("ss.spans")).as("span"))
      .select(
        col("span.traceId").as("trace_id"),
        col("span.spanId").as("span_id"),
        col("span.parentSpanId").as("parent_span_id"),
        col("span.name").as("name"),
        coalesce(kindName(col("span.kind")), lit("unrecognized")).as("kind"),
        when(col("span.status.code") === 2, "error")
          .when(col("span.status.code") === 1, "ok")
          .otherwise("unset").as("state"),
        col("span.status.code").as("status"),
        col("span.status.message").as("description"),
        element_at(col("__res"), "service.name").as("service"),
        col("span.startTimeUnixNano").as("start_time"),
        col("span.endTimeUnixNano").as("end_time"),
        col("span.endTimeUnixNano").as("time"),
        (col("span.endTimeUnixNano") - col("span.startTimeUnixNano")).as("metric"),
        map_from_entries(col("span.attributes")).as("attributes"))

  /** OTLP metrics export → metric events — the modern default metrics
    * wire format (the reference ingests metrics only via Prometheus
    * remote-write, `prometheus.clj:11-29`; OTLP metrics is the same
    * role for OpenTelemetry SDKs): one event per data point, tagged
    * with its metric family. Gauge and sum points carry their value as
    * `metric` (count 1); a histogram point carries its pre-aggregated
    * `sum` as `metric` and its population as `count` — the same
    * (sum, count) reduction Prometheus summaries expose, so downstream
    * rate/mean algebra composes identically.
    *
    * A summary point (the legacy-Prometheus quantile family bridged
    * through an OTLP collector) fans out to ONE EVENT PER QUANTILE:
    * `metric` is the quantile value, `count` the point's population,
    * and the φ itself lands in `attributes` under the `quantile` key —
    * exactly the label shape Prometheus remote-write quantiles arrive
    * with (reference `prometheus.clj:11-29`) and the shape this
    * library's own `percentiles` emits, so the two compose.
    *
    * Input schema (ExportMetricsServiceRequest shape; a metric family
    * FIELD may be entirely absent from the schema — e.g. JSON-ingested
    * OTLP that never saw a summary — or present with null structs or
    * null/empty dataPoints):
    * `resourceMetrics: array<struct<
    *    resource: struct<attributes: array<struct<key, value>>>,
    *    scopeMetrics: array<struct<metrics: array<struct<
    *      name, unit,
    *      gauge: struct<dataPoints: array<struct<
    *        startTimeUnixNano, timeUnixNano, asDouble,
    *        attributes: array<struct<key, value>>>>>,
    *      sum: struct<dataPoints: array<...same...>, isMonotonic>,
    *      histogram: struct<dataPoints: array<struct<
    *        startTimeUnixNano, timeUnixNano, count, sum,
    *        bucketCounts, explicitBounds, attributes>>>,
    *      expHistogram: struct<dataPoints: array<struct<
    *        ...histogram fields..., scale, zeroCount,
    *        positive/negative: struct<offset, bucketCounts>>>>,
    *      summary: struct<dataPoints: array<struct<
    *        startTimeUnixNano, timeUnixNano, count, sum,
    *        quantileValues: array<struct<quantile, value>>,
    *        attributes>>>>>>>>>`.
    *
    * Pure explode algebra like [[otlpSpans]] — fuses into the scan.
    */
  def otlpMetrics(df: DataFrame): DataFrame = {
    val ptType = "array<struct<mtype:string,time:bigint,metric:double," +
      "count:bigint,attributes:array<struct<key:string,value:string>>>>"
    val exploded = df.select(explode(col("resourceMetrics")).as("rm"))
      .select(
        map_from_entries(col("rm.resource.attributes")).as("__res"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("__res"), explode(col("sm.metrics")).as("m"))
    // a family absent from the SCHEMA (not just null) contributes an
    // empty array instead of an unresolved-field AnalysisException
    val mFields = exploded.schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    val empty = array().cast(ptType)
    def numPts(fld: String, typ: String): Column = {
      if (!mFields.contains(fld)) return empty
      val arr = col(s"m.$fld.dataPoints")
      coalesce(
        when(arr.isNotNull, transform(arr, p => struct(
          lit(typ).as("mtype"),
          p.getField("timeUnixNano").cast("long").as("time"),
          p.getField("asDouble").cast("double").as("metric"),
          lit(1L).as("count"),
          p.getField("attributes").as("attributes")))),
        empty)
    }
    def histPts(fld: String, typ: String): Column = {
      if (!mFields.contains(fld)) return empty
      val arr = col(s"m.$fld.dataPoints")
      coalesce(
        when(arr.isNotNull, transform(arr, p => struct(
          lit(typ).as("mtype"),
          p.getField("timeUnixNano").cast("long").as("time"),
          p.getField("sum").cast("double").as("metric"),
          p.getField("count").cast("long").as("count"),
          p.getField("attributes").as("attributes")))),
        empty)
    }
    def summaryPts(fld: String): Column = {
      if (!mFields.contains(fld)) return empty
      val arr = col(s"m.$fld.dataPoints")
      coalesce(
        when(arr.isNotNull, flatten(transform(arr, p =>
          transform(p.getField("quantileValues"), q => struct(
            lit("summary").as("mtype"),
            p.getField("timeUnixNano").cast("long").as("time"),
            q.getField("value").cast("double").as("metric"),
            p.getField("count").cast("long").as("count"),
            concat(p.getField("attributes"),
              array(struct(lit("quantile").as("key"),
                q.getField("quantile").cast("double").cast("string")
                  .as("value")))).as("attributes"))))).cast(ptType)),
        empty)
    }
    exploded
      .select(col("__res"), col("m.name").as("name"), col("m.unit").as("unit"),
        explode(concat(numPts("gauge", "gauge"), numPts("sum", "sum"),
          histPts("histogram", "histogram"),
          histPts("expHistogram", "exponential_histogram"),
          summaryPts("summary"))).as("p"))
      .select(
        col("name"),
        col("unit"),
        col("p.mtype").as("mtype"),
        element_at(col("__res"), "service.name").as("service"),
        col("p.time").as("time"),
        col("p.metric").as("metric"),
        col("p.count").as("count"),
        map_from_entries(col("p.attributes")).as("attributes"))
  }

  /** OTLP severity_number → the spec's range name: 1-4 trace, 5-8 debug,
    * 9-12 info, 13-16 warn, 17-20 error, 21-24 fatal; everything else
    * (incl. 0) unspecified. The log twin of [[otlpSpans]]' kind names.
    */
  def severityName(n: Column): Column =
    when(n.between(1, 4), "trace")
      .when(n.between(5, 8), "debug")
      .when(n.between(9, 12), "info")
      .when(n.between(13, 16), "warn")
      .when(n.between(17, 20), "error")
      .when(n.between(21, 24), "fatal")
      .otherwise("unspecified")

  /** OTLP logs export → log events — the third OTLP signal next to
    * [[otlpSpans]] and [[otlpMetrics]] (the reference ingests logs as
    * Riemann events with a `state`; OTLP logs is the OpenTelemetry-SDK
    * path for the same role): one event per LogRecord, with the
    * severity range name as `state` (the spec's 6 ranges via
    * [[severityName]]), the body string as `description`, the raw
    * severity fields preserved, and trace/span correlation ids carried
    * through so logs join traces.
    *
    * Input schema (ExportLogsServiceRequest shape; any LogRecord field
    * other than `timeUnixNano`/`severityNumber` may be entirely absent
    * from the schema — e.g. JSON-ingested OTLP that never carried
    * correlation ids — and contributes null instead of an
    * AnalysisException):
    * `resourceLogs: array<struct<
    *    resource: struct<attributes: array<struct<key, value>>>,
    *    scopeLogs: array<struct<logRecords: array<struct<
    *      timeUnixNano, observedTimeUnixNano, severityNumber: long,
    *      severityText, body, traceId, spanId,
    *      attributes: array<struct<key, value>>>>>>>>`.
    *
    * Pure explode algebra — fuses into the scan, no shuffle.
    */
  def otlpLogs(df: DataFrame): DataFrame = {
    val exploded = df.select(explode(col("resourceLogs")).as("rl"))
      .select(
        map_from_entries(col("rl.resource.attributes")).as("__res"),
        explode(col("rl.scopeLogs")).as("sl"))
      .select(col("__res"), explode(col("sl.logRecords")).as("rec"))
    val recFields = exploded.schema("rec").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    def opt(fld: String, typ: String): Column =
      if (recFields.contains(fld)) col(s"rec.$fld").cast(typ)
      else lit(null).cast(typ)
    exploded.select(
      col("rec.timeUnixNano").as("time"),
      opt("observedTimeUnixNano", "long").as("observed_time"),
      col("rec.severityNumber").as("severity_number"),
      opt("severityText", "string").as("severity_text"),
      severityName(col("rec.severityNumber")).as("state"),
      opt("body", "string").as("description"),
      opt("traceId", "string").as("trace_id"),
      opt("spanId", "string").as("span_id"),
      element_at(col("__res"), "service.name").as("service"),
      if (recFields.contains("attributes"))
        map_from_entries(col("rec.attributes")).as("attributes")
      else map().cast("map<string,string>").as("attributes"))
  }
}
