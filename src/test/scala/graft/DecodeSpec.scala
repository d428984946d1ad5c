package graft

import graft.sources.Decode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Struct-path decode tolerances that the oracle gates can't exercise:
  * metric-family / log-record fields ABSENT from the input schema (the
  * shape JSON-ingested OTLP produces when a signal variant never
  * occurred in the batch) must contribute nulls/empties, not
  * AnalysisExceptions. The full-schema paths are oracle-gated
  * (`otlp_metrics_decode`, `otlp_logs_decode` + wire twins).
  */
class DecodeSpec extends AnyFunSuite {
  import TestSpark.spark

  test("otlpMetrics: family fields absent from the schema are tolerated") {
    val s = spark
    // gauge-only request shape: no sum/histogram/expHistogram/summary
    // fields exist in the schema at all
    val df = s.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        """resourceMetrics array<struct<
          |  resource: struct<attributes: array<struct<key: string, value: string>>>,
          |  scopeMetrics: array<struct<metrics: array<struct<
          |    name: string, unit: string,
          |    gauge: struct<dataPoints: array<struct<
          |      startTimeUnixNano: bigint, timeUnixNano: bigint,
          |      asDouble: double,
          |      attributes: array<struct<key: string, value: string>>>>>>>>>>>"""
          .stripMargin.replaceAll("\\n\\s*", " ")))
    // must analyze and run (zero rows in, zero out) without resolving
    // the absent families
    assert(Decode.otlpMetrics(df).collect().isEmpty)
    assert(Decode.otlpMetrics(df).columns.contains("mtype"))
  }

  test("otlpLogs: optional LogRecord fields absent from the schema decode as nulls") {
    val s = spark
    import s.implicits._
    val minimal = Seq(
      ("svc-1", 1700000000000000000L, 17L),
      ("svc-1", 1700000000000000001L, 9L))
      .toDF("svc", "t", "sev")
      .groupBy("svc")
      .agg(collect_list(struct(col("t").as("timeUnixNano"),
        col("sev").as("severityNumber"))).as("logRecords"))
      .select(array(struct(
        struct(array(struct(lit("service.name").as("key"),
          col("svc").as("value"))).as("attributes")).as("resource"),
        array(struct(col("logRecords"))).as("scopeLogs"))).as("resourceLogs"))
    val out = Decode.otlpLogs(minimal)
      .select("time", "state", "description", "trace_id", "service")
      .orderBy("time").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1700000000000000000L)
    assert(out(0).getString(1) == "error" && out(1).getString(1) == "info")
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(0).getString(4) == "svc-1")
  }
}
