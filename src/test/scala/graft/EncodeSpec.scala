package graft

import graft.sinks.Encode
import graft.sources.Decode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink payload formatting (reference `output/..._test.clj` layer):
  * PagerDuty bodies, Elasticsearch bulk lines, Prometheus remote-write
  * encode — including a full encode→decode round trip.
  */
class EncodeSpec extends AnyFunSuite {
  import TestSpark._

  test("pagerduty: action from state, severity mapping, summary/dedup joins") {
    val df = events(
      ev(1, 10 * S, host = "h1", service = "db", state = "critical", id = 1),
      ev(2, 20 * S, host = "h2", service = "web", state = "ok", id = 2))
    val out = Encode.pagerduty(df, "rk-123", "host",
      summaryKeys = Seq("host", "service"), dedupKeys = Seq("host", "service"))
      .select("eventId", "event_action", "pd_body").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "trigger")
    assert(out(2L)._1 == "resolve")
    val body1 = out(1L)._2
    assert(body1.contains(""""routing_key":"rk-123""""))
    assert(body1.contains(""""summary":"h1 - db""""))
    assert(body1.contains(""""dedup_key":"h1-db""""))
    assert(body1.contains(""""severity":"critical""""))
    assert(body1.contains(""""timestamp":"1970-01-01T00:00:10Z""""))
    assert(out(2L)._2.contains(""""severity":"info""""))
  }

  test("elasticsearch bulk: date-suffixed index line + @timestamp source line") {
    val df = events(ev(1, 10 * S, host = "h1", id = 1))
    val bulk = Encode.elasticsearchBulk(df, "events").select("bulk")
      .collect().head.getString(0)
    val Array(action, source) = bulk.split("\n")
    assert(action == """{"index":{"_index":"events-1970-01-01"}}""")
    assert(source.contains(""""@timestamp":"1970-01-01T00:00:10Z""""))
    assert(!source.contains(""""time""""))
    assert(source.contains(""""host":"h1""""))
  }

  test("prometheus encode → decode round-trips the events") {
    val df = events(
      ev(1.5, 10 * S, host = "h1", id = 1, attributes = Map("job" -> "db")),
      ev(2.5, 20 * S, host = "h1", id = 2, attributes = Map("job" -> "db")),
      ev(9.0, 30 * S, host = "h2", id = 3, attributes = Map("job" -> "web")))
      .withColumn("name", lit("reqs"))
    val requests = Encode.prometheusWriteRequests(Encode.prometheusSeries(df), 10)
    assert(requests.count() == 1)
    val back = Decode.prometheusWrite(requests)
      .select(col("name"), element_at(col("attributes"), "job").as("job"),
        col("metric"), col("time"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(back == Set(
      ("reqs", "db", 1.5, 10L * S), ("reqs", "db", 2.5, 20L * S),
      ("reqs", "web", 9.0, 30L * S)))
  }
}
