package graft.ir

import graft.model.Event
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The tap/golden test framework — the Spark port of the reference's
  * user-facing testing discipline (`/root/reference/src/clojure/mirabelle/test.clj:41-82`):
  * a test case is data — `{input: [events…], taps: {tap-name: [expected…]}}`
  * — executed against a declared pipeline in test mode (sinks suppressed,
  * `tap` nodes recording), then actual vs expected is diffed per tap.
  *
  * Deltas from the reference, by design (SURVEY §7.4.3):
  *  - expected events are compared on the keys they declare (the reference
  *    compares whole maps, but its events carry engine-injected defaults);
  *  - tap capture order is (time, eventId), not arrival order — a batch
  *    plan has no arrival order, so fixtures must be order-insensitive or
  *    time-keyed (all the reference's shipped fixtures are).
  *
  * Fixture JSON (the EDN shape 1:1, reference
  * `test/resources/test/successful/tests/test1.edn`):
  * {{{
  * {"tests": {"t1": {"target": "my-stream",
  *                   "input": [{"metric": 13, "time": 1}],
  *                   "taps": {"foo": [{"metric": 13}]}}}}
  * }}}
  */
object TapTestKit {

  final case class TapFailure(test: String, tap: String, message: String) {
    override def toString = s"[$test/$tap] $message"
  }

  /** Build an event frame from literal maps; `eventId` defaults to input
    * order, `time` accepts any JSON number (ns).
    */
  def eventsDf(spark: SparkSession, input: Seq[Map[String, Any]]): DataFrame = {
    def s(m: Map[String, Any], k: String): String =
      m.get(k).filter(_ != null).map(_.toString).orNull
    def d(m: Map[String, Any], k: String): java.lang.Double =
      m.get(k).filter(_ != null).map(_.asInstanceOf[Number].doubleValue()).map(Double.box).orNull
    val rows = input.zipWithIndex.map { case (m, i) =>
      Row(
        s(m, "host"), s(m, "service"), s(m, "name"), s(m, "state"),
        d(m, "metric"),
        m.get("time").map(_.asInstanceOf[Number].longValue()).getOrElse(0L),
        d(m, "ttl"),
        s(m, "description"),
        m.get("tags").map(_.asInstanceOf[Seq[Any]].map(_.toString)).orNull,
        m.get("attributes")
          .map(_.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> String.valueOf(v) })
          .orNull,
        m.get("eventId").map(_.asInstanceOf[Number].longValue()).getOrElse(i.toLong)
      )
    }
    spark.createDataFrame(rows.asJava, Event.schema)
  }

  /** Run one case against a pipeline; returns failures (empty = pass). */
  def runCase(spark: SparkSession, testName: String, pipeline: Node,
              input: Seq[Map[String, Any]],
              taps: Map[String, Seq[Map[String, Any]]],
              ctx: EngineCtx = EngineCtx()): Seq[TapFailure] = {
    val res = Engine.run(pipeline, eventsDf(spark, input), ctx.copy(testMode = true))
    taps.toSeq.flatMap { case (tapName, expected) =>
      res.taps.get(tapName) match {
        case None =>
          Seq(TapFailure(testName, tapName, "tap not reached by the pipeline"))
        case Some(df) => compareTap(testName, tapName, df, expected)
      }
    }
  }

  /** Run a whole fixture document against a registry (`target` names the
    * stream per case; a single-stream registry may omit it).
    */
  def runFixture(spark: SparkSession, fixtureJson: String,
                 registry: StreamRegistry,
                 ctx: EngineCtx = EngineCtx()): Seq[TapFailure] = {
    import org.json4s.jackson.JsonMethods
    runFixtureDoc(spark, Node.anyOf(JsonMethods.parse(fixtureJson)), registry, ctx)
  }

  /** Strip EDN keyword prefixes from map keys recursively, so a fixture
    * parsed by [[Edn.parse]] and one parsed from JSON address the same
    * `"tests"`/`"input"`/`"taps"` keys.
    */
  private def normKeys(any: Any): Any = any match {
    case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]]
      .map { case (k, v) => k.toString.stripPrefix(":") -> normKeys(v) }
    case xs: Seq[_] => xs.map(normKeys)
    case other => other
  }

  /** Format/agnostic fixture entry (the CLI `test` command's core):
    * takes the ALREADY-PARSED document — JSON (`Node.anyOf`) or EDN
    * (`Edn.parse`) — and mirrors the reference runner's dispatch
    * (`test.clj:41-82`): a case with `target` runs that stream; a case
    * without one runs through the registry's DEFAULT streams (the
    * reference's `(or target :default)`), comparing each expected tap
    * against the union of captures. `tap-results` is accepted as the
    * reference's alias for `taps`. Both paths force `testMode` on the
    * given ctx — a fixture can never fire live sinks.
    */
  def runFixtureDoc(spark: SparkSession, parsed: Any,
                    registry: StreamRegistry,
                    ctx: EngineCtx = EngineCtx()): Seq[TapFailure] = {
    val doc = normKeys(parsed).asInstanceOf[Map[String, Any]]
    val tests = doc.getOrElse("tests", doc).asInstanceOf[Map[String, Any]]
    tests.toSeq.sortBy(_._1).flatMap { case (name, caseAny) =>
      val c = caseAny.asInstanceOf[Map[String, Any]]
      val input = c.getOrElse("input", Seq.empty).asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      val taps = c.get("taps").orElse(c.get("tap-results"))
        .getOrElse(Map.empty).asInstanceOf[Map[String, Any]]
        .map { case (k, v) =>
          k -> v.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
        }
      c.get("target").map(_.toString) match {
        case Some(target) =>
          registry.get(target) match {
            case None => Seq(TapFailure(name, "-", s"unknown target stream '$target'"))
            case Some(pipeline) => runCase(spark, name, pipeline, input, taps, ctx)
          }
        case None if registry.defaults.nonEmpty =>
          runCaseViaDefaults(spark, name, registry, input, taps, ctx)
        case None =>
          registry.list.headOption match {
            case None => Seq(TapFailure(name, "-", "no target stream and empty registry"))
            case Some(only) => runCase(spark, name, registry.get(only).get, input, taps, ctx)
          }
      }
    }
  }

  /** No-target case: run every DEFAULT stream's pipeline (in test mode —
    * the caller's ctx is honored, with `testMode` forced exactly like
    * [[runCase]], so sinks never fire from a test regardless of how the
    * registry itself was built) and compare each expected tap against
    * the UNION of captures across them.
    */
  private def runCaseViaDefaults(spark: SparkSession, testName: String,
                                 registry: StreamRegistry,
                                 input: Seq[Map[String, Any]],
                                 taps: Map[String, Seq[Map[String, Any]]],
                                 ctx: EngineCtx): Seq[TapFailure] = {
    val df = eventsDf(spark, input)
    val results = registry.defaults.flatMap(registry.get).map(p =>
      Engine.run(p, df, ctx.copy(testMode = true), registry))
    val captured: Map[String, Seq[DataFrame]] = results
      .flatMap(_.taps.toSeq).groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    taps.toSeq.flatMap { case (tapName, expected) =>
      captured.get(tapName) match {
        case None => Seq(TapFailure(testName, tapName, "tap not reached by any default stream"))
        case Some(dfs) =>
          // allowMissingColumns: two streams tapping the same name after
          // different projections must still diff field-by-field, not
          // die in an AnalysisException
          val merged = dfs.reduce(_.unionByName(_, allowMissingColumns = true))
          compareTap(testName, tapName, merged, expected)
      }
    }
  }

  private def compareTap(testName: String, tapName: String, df: DataFrame,
                         expected: Seq[Map[String, Any]]): Seq[TapFailure] = {
    val ordered =
      if (df.columns.contains("time") && df.columns.contains("eventId"))
        df.orderBy("time", "eventId")
      else df
    val actual = ordered.collect().toSeq.map(rowToMap)
    if (actual.size != expected.size)
      Seq(TapFailure(testName, tapName,
        s"expected ${expected.size} events, got ${actual.size}: $actual"))
    else expected.zip(actual).zipWithIndex.flatMap { case ((exp, act), i) =>
      diffKeys(exp, act).map { k =>
        TapFailure(testName, tapName,
          s"event #$i field '$k': expected ${exp(k)}, got ${act.get(k)}")
      }
    }
  }

  // ---------------- comparison ----------------

  private def rowToMap(r: Row): Map[String, Any] =
    r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap

  /** Keys of `expected` whose values don't match `actual`. */
  private def diffKeys(expected: Map[String, Any], actual: Map[String, Any]): Seq[String] =
    expected.collect {
      case (k, v) if !actual.get(k).exists(valEq(v, _)) => k
    }.toSeq

  private def valEq(exp: Any, act: Any): Boolean = (exp, act) match {
    case (null, a)                  => a == null
    case (_, null)                  => false
    case (e: Number, a: Number)     => e.doubleValue() == a.doubleValue()
    case (e: Map[_, _], a: Map[_, _]) =>
      val am = a.asInstanceOf[Map[Any, Any]].map { case (k, v) => k.toString -> v }
      e.asInstanceOf[Map[Any, Any]].forall { case (k, v) =>
        am.get(k.toString).exists(valEq(v, _))
      }
    case (e: Seq[_], a: Seq[_])     =>
      e.size == a.size && e.zip(a).forall { case (x, y) => valEq(x, y) }
    case (e, a: Seq[_])             => a.size == 1 && valEq(e, a.head)
    case (e, a)                     => e == a || e.toString == String.valueOf(a)
  }
}
