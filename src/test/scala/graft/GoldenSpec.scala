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

  /** Port of `/root/reference/test/resources/test/failed/` — the
    * reference's failure-path corpus, streams loaded VERBATIM from its
    * own EDN (two files, like its two-file streams directory; `:custom`
    * resolves by NAME from the custom registry and overrides builtins,
    * `stream.clj:29-34`). Each case pushes through every default stream
    * with taps merged; t1/t3 must pass and t2 must mismatch exactly as
    * the corpus intends (expected 100, actual 101).
    */
  test("golden: failed/tests/test1.edn — framework reports exactly the planted t2 mismatch") {
    import graft.conditions.Condition
    import org.apache.spark.sql.functions.col
    assume(RefFixtures.available("test/resources/test/failed/streams/streams.edn",
      "test/resources/test/failed/streams/streams2.edn"),
      s"reference checkout not found under ${RefFixtures.root}")
    val reg = new StreamRegistry(EngineCtx(testMode = true, custom = Map(
      // the reference test registers :custom as a where-like builder
      "custom" -> (args => df => df.filter(Condition.parse(args.head).column)))))
    reg.addEdn(RefFixtures.read("test/resources/test/failed/streams/streams.edn"))
    reg.addEdn(RefFixtures.read("test/resources/test/failed/streams/streams2.edn"))
    assert(reg.defaults.sorted == Seq("bar", "baz", "foo"))

    def tapMetrics(input: Seq[Map[String, Any]]): Map[String, Seq[Double]] = {
      val df = graft.ir.TapTestKit.eventsDf(TestSpark.spark, input)
      reg.push(df).values.toSeq
        .flatMap(_.taps.toSeq)
        .groupBy(_._1)
        .map { case (tap, dfs) =>
          tap -> dfs.flatMap(_._2.select(col("metric")).collect().map(_.getDouble(0)))
        }
        .filter(_._2.nonEmpty) // a tap no event reached captures nothing
    }
    // t1: 13 passes only foo's 10<m<20 custom condition
    assert(tapMetrics(Seq(Map("metric" -> 13, "time" -> 1e9))) ==
      Map("foo" -> Seq(13.0)))
    // t2: 101 reaches tap foo via bar's where — the corpus expects 100,
    // so the framework must report a mismatch, not a pass
    val t2 = tapMetrics(Seq(Map("metric" -> 101, "time" -> 1e9)))
    assert(t2 == Map("foo" -> Seq(101.0)) && t2("foo") != Seq(100.0))
    // t3: 101 + service "aa" lands on foo (via bar) and baz
    assert(tapMetrics(Seq(Map("metric" -> 101, "service" -> "aa", "time" -> 1e9))) ==
      Map("foo" -> Seq(101.0), "baz" -> Seq(101.0)))
  }

  /** Port of `/root/reference/dev/resources/streams/stream.clj` loaded
    * VERBATIM: exercises `:description` metadata maps (ignored), list-form
    * `:children`, keyword channel params, and publish! routing.
    */
  test("golden: dev/resources/streams/stream.clj — publish! routing from the verbatim file") {
    assume(RefFixtures.available("dev/resources/streams/stream.clj"),
      s"reference checkout not found under ${RefFixtures.root}")
    val reg = new StreamRegistry(EngineCtx(testMode = true))
    assert(reg.addEdn(RefFixtures.read("dev/resources/streams/stream.clj")) == Seq("bar"))
    assert(reg.defaults == Seq("bar"))
    val df = graft.ir.TapTestKit.eventsDf(TestSpark.spark, Seq(
      Map("service" -> "bar", "metric" -> 1, "time" -> 1e9),
      Map("service" -> "other", "metric" -> 2, "time" -> 2e9)))
    val res = reg.push(df)("bar")
    assert(res.channels.keySet == Set("my-channel"))
    val got = res.channels("my-channel").select(
      org.apache.spark.sql.functions.col("service")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("bar"))
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
