package graft

import graft.ir._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tap tests ported from the reference's own fixture corpus —
  * the user-facing testing discipline (`test.clj:41-82`) running over IR
  * pipelines through [[graft.ir.TapTestKit]].
  */
class GoldenSpec extends AnyFunSuite {
  import TestSpark.spark

  /** Port of `/root/reference/test/resources/test/successful/tests/test1.edn`:
    * three cases against a trivial tap stream (t1/t2 use a plain tap,
    * t3 expects the same events on two taps of an sdo fan-out).
    */
  test("golden: successful/tests/test1.edn") {
    val reg = new StreamRegistry(EngineCtx(testMode = true))
    reg.add("plain", Node.fromJson(
      """{"action":"sdo","children":[{"action":"tap","params":["foo"]}]}"""))
    reg.add("fanout", Node.fromJson(
      """{"action":"sdo","children":[
        |  {"action":"tap","params":["foo"]},
        |  {"action":"tap","params":["baz"]}]}""".stripMargin))
    val failures = TapTestKit.runFixture(spark,
      """{"tests": {
        |  "t1": {"target": "plain",
        |         "input": [{"metric": 13}],
        |         "taps": {"foo": [{"metric": 13}]}},
        |  "t2": {"target": "plain",
        |         "input": [{"metric": 101}],
        |         "taps": {"foo": [{"metric": 101}]}},
        |  "t3": {"target": "fanout",
        |         "input": [{"metric": 101, "service": "aa"}],
        |         "taps": {"foo": [{"metric": 101, "service": "aa"}],
        |                  "baz": [{"metric": 101, "service": "aa"}]}}
        |}}""".stripMargin, reg)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Port of `/root/reference/dev/resources/tests/test1.edn` — the
    * percentile-alerting scenario: http request durations → per-window
    * 0.99-quantile → threshold → critical alert on the tap.
    *
    * Documented delta (SURVEY §7.4.3): the reference flushes the window
    * when the event clock passes window end + delay, so the emitted alert
    * carries the flush time (70e9); the batch twin emits the picked
    * event's own identity — the expectation below asserts the semantic
    * payload (name/metric/state/quantile), not the flush timestamp.
    */
  test("golden: dev/tests/test1.edn percentile alerting") {
    val pipeline = Node.fromJson(
      """{"action":"where","params":[["=","name","http_request_duration_seconds"]],
        | "children":[
        |  {"action":"percentiles","params":[{"duration":60,"quantiles":[0.99]}],
        |   "children":[
        |    {"action":"where","params":[[">","metric",5]],"children":[
        |      {"action":"with","params":[{"state":"critical"}],"children":[
        |        {"action":"tap","params":["alert"]}]}]}]}]}""".stripMargin)
    val failures = TapTestKit.runCase(spark, "percentiles", pipeline,
      input = Seq(
        Map("name" -> "http_request_duration_seconds", "metric" -> 0.1, "time" -> 1e9),
        Map("name" -> "http_request_duration_seconds", "metric" -> 1.2, "time" -> 30e9),
        Map("name" -> "http_request_duration_seconds", "metric" -> 10, "time" -> 40e9),
        Map("name" -> "http_request_duration_seconds", "metric" -> 8, "time" -> 50e9),
        Map("name" -> "http_request_duration_seconds", "metric" -> 3, "time" -> 70e9)),
      taps = Map("alert" -> Seq(
        Map("name" -> "http_request_duration_seconds",
          "metric" -> 10,
          "state" -> "critical",
          "attributes" -> Map("quantile" -> "0.99")))))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("tap framework reports a diff on mismatch (test.clj:9-18 shape)") {
    val pipeline = Node.fromJson(
      """{"action":"increment","children":[{"action":"tap","params":["out"]}]}""")
    val failures = TapTestKit.runCase(spark, "neg", pipeline,
      input = Seq(Map("metric" -> 1, "time" -> 1e9)),
      taps = Map("out" -> Seq(Map("metric" -> 99))))
    assert(failures.size == 1)
    assert(failures.head.message.contains("expected 99"))
  }
}
