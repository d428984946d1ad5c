package graft.operators

import graft.conditions.Condition
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time tumbling-window aggregations (SURVEY §2.5) and the
  * collection (window-payload) aggregates (§2.6).
  *
  * The reference implements one shared `aggregation*` machine
  * (`src/clojure/mirabelle/action.clj:2387-2454`): window index =
  * `(time - start) / duration`, allowed lateness via `:delay`, pluggable
  * accumulate/finalize pairs (`action.clj:2285-2374`) — exactly Spark's
  * partial/final aggregate split. Here each window op is a single
  * `groupBy(windowStart, keys).agg(...)`: map-side partial aggregation,
  * one shuffle on (window, keys), whole-stage codegen — the plan scales
  * linearly with input and never materializes per-window buffers except
  * for the ops that genuinely emit the window payload (`collect_list`).
  *
  * Windows here are epoch-aligned (the reference aligns to the first event
  * seen, `action.clj:2407-2417` — a single-process notion that has no
  * distributed equivalent; epoch alignment is the deterministic,
  * partition-friendly choice and is what the DuckDB oracle mirrors).
  *
  * Event time is a ns-long; window arithmetic stays in integer space
  * (ns longs exceed 2^53 — double arithmetic would corrupt them).
  */
object Windows {

  /** Epoch-aligned window start (ns) for a duration in seconds. */
  def windowStart(durationSeconds: Long, timeCol: String = "time"): Column = {
    val d = durationSeconds * graft.model.Event.NsPerSecond
    expr(s"($timeCol div ${d}L) * ${d}L")
  }

  private def grouped(df: DataFrame, durationSeconds: Long, keys: Seq[String]) =
    df.groupBy((col("window_start") +: keys.map(col)): _*)

  private def withWindow(df: DataFrame, durationSeconds: Long): DataFrame =
    df.withColumn("window_start", windowStart(durationSeconds))

  /** Deterministic "latest event" ordering key: ties on `time` broken by
    * `eventId` (the reference keeps first-seen on ties, `math.clj:39-63`;
    * arrival order does not exist in a distributed engine, so we pin a
    * total order instead).
    */
  private val latestKey: Column = struct(col("time"), col("eventId"))

  /** Collect a window payload as an array of event structs, ordered by
    * (time, eventId) regardless of column order.
    */
  private[graft] def collectOrdered(cols: Seq[String]): Column =
    transform(
      array_sort(
        collect_list(struct(
          struct(col("time"), col("eventId")).as("__k"),
          struct(cols.map(col): _*).as("__e"))),
        // events may carry MapType fields (attributes), which Spark's
        // natural struct ordering rejects — compare the orderable key only
        (a, b) => keyCompare(a.getField("__k"), b.getField("__k"))),
      x => x.getField("__e"))

  private def keyCompare(x: Column, y: Column): Column =
    when(x < y, -1).when(x > y, 1).otherwise(0)

  /** `fixed-time-window` — tumbling window emitting the list of events
    * (`action.clj:2564-2594`), ordered by (time, eventId).
    */
  def fixedTimeWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(collectOrdered(df.columns.toSeq).as("events"))

  /** `sum` — per-window sum of `metric`, payload = latest event
    * (`action.clj:2468-2490`).
    */
  def sumWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    aggWindow(df, durationSeconds, keys, sum(col("metric")))

  /** `mean` — per-window mean (`action.clj:2540-2562`). */
  def meanWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    aggWindow(df, durationSeconds, keys, avg(col("metric")))

  /** `rate` — count/duration per window (`action.clj:2836-2843`). */
  def rateWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    aggWindow(df, durationSeconds, keys, count(lit(1)).cast(DoubleType) / lit(durationSeconds.toDouble))

  /** Pluggable aggregation-pair surface (SURVEY §2.9): the reference's
    * window aggregations are user-extensible accumulate/finalize pairs
    * (`keyword->aggr-fn`, `action.clj:2285-2374`); the Spark twin is "any
    * aggregation `Column`" — built-ins, `udaf()`-wrapped typed
    * [[org.apache.spark.sql.expressions.Aggregator]]s
    * (see [[graft.functions.Aggregators]]), whatever composes. The
    * aggregate lands on `metric` of the window's latest event, like every
    * built-in window op.
    */
  def customWindow(durationSeconds: Long, metricAgg: Column, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    aggWindow(df, durationSeconds, keys, metricAgg)

  private def aggWindow(df: DataFrame, durationSeconds: Long, keys: Seq[String], metricAgg: Column): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(max_by(all, latestKey).as("base"), metricAgg.as("m"))
      .select((col("window_start") +: keys.map(col)) ++ Seq(col("base"), col("m")): _*)
      .select(col("window_start"), col("base.*"), col("m"))
      .drop("metric").withColumnRenamed("m", "metric")
  }

  /** `top` / `bottom` — per-window event with the max/min metric
    * (`action.clj:2492-2538`); ties broken by (time, eventId) so the
    * result is a total function of the data.
    */
  def topWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    extremumWindow(df, durationSeconds, keys, isTop = true)
  def bottomWindow(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    extremumWindow(df, durationSeconds, keys, isTop = false)

  private def extremumWindow(df: DataFrame, durationSeconds: Long, keys: Seq[String], isTop: Boolean): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    // the reference's :max/:min folds keep the NEW event on a metric tie
    // (`action.clj:2286-2311` — strict > / < against the state), so the
    // LATEST tied event wins for top AND bottom; min_by therefore
    // negates the arrival component of the ordering
    val pick =
      if (isTop) max_by(all, struct(col("metric"), col("time"), col("eventId")))
      else min_by(all, struct(col("metric"), -col("time"), -col("eventId")))
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(pick.as("base"))
      .select(col("window_start"), col("base.*"))
  }

  /** `ratio` — per-window ratio of events (or metric sums) matching cond1
    * vs cond2 (`action.clj:2975-3009`); Double semantics (the reference
    * yields Clojure rationals — SURVEY §7.4.5 pins Double here).
    */
  def ratioWindow(durationSeconds: Long, c1: Condition, c2: Condition,
                  useMetric: Boolean = false, keys: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    def side(c: Condition): Column =
      if (useMetric) sum(when(c.column, col("metric")).otherwise(lit(0.0)))
      else sum(when(c.column, lit(1.0)).otherwise(lit(0.0)))
    // try_divide: a window where nothing matches cond2 yields a NULL
    // ratio instead of aborting the job under ANSI mode (and NULL is
    // DuckDB's x/0 result, so the oracle pins it)
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(try_divide(side(c1), side(c2)).as("metric"))
  }

  /** `ssort` — buffer per window, emit events sorted by a field
    * (`action.clj:2641-2691`). One shuffle; the sort happens inside each
    * window's array, not as a global sort.
    */
  def ssort(durationSeconds: Long, field: String, keys: Seq[String] = Nil,
            emitPos: Boolean = false)(df: DataFrame): DataFrame = {
    val cols = df.columns
    val sortKey = struct(col(field), col("eventId"))
    val sorted = withWindow(df, durationSeconds)
      .groupBy((col("window_start") +: keys.map(col)): _*)
      .agg(array_sort(
        collect_list(struct(sortKey.as("__k"), struct(cols.map(col): _*).as("__e"))),
        (a, b) => keyCompare(a.getField("__k"), b.getField("__k"))).as("sorted"))
    // emitPos surfaces the emission index so tests can assert the one thing
    // ssort adds over its input: the per-window emitted order.
    if (emitPos)
      sorted.select(col("window_start"), posexplode(col("sorted.__e")).as(Seq("pos", "event")))
        .select(col("window_start"), col("pos"), col("event.*"))
    else
      sorted.select(explode(col("sorted.__e")).as("event")).select(col("event.*"))
  }

  /** `coalesce` — every duration, emit the latest non-expired event per
    * `fields` combination (`action.clj:721-821`). Expiry clock = max event
    * time within the window (batch analog of the reference's running
    * clock).
    */
  def coalesceWindow(durationSeconds: Long, fields: Seq[String])(df: DataFrame): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    withWindow(df, durationSeconds)
      .groupBy((col("window_start") +: fields.map(col)): _*)
      .agg(max_by(all, latestKey).as("base"), max(col("time")).as("__clock"))
      .select(col("window_start"), col("base.*"), col("__clock"))
      .filter(!Stateless.expiredPredicate(col("__clock")))
      .drop("__clock")
  }

  /** `project` — latest event matching each of N conditions
    * (`action.clj:1377-1463`): one pass, N conditional max_by aggregates —
    * no self-join, no extra shuffle. On a streaming frame this same plan
    * is the continuously-updated "current state" view: run the sink in
    * update/complete mode (append mode has nothing to emit for an
    * unwindowed aggregate, and Spark rejects it with a clear error).
    */
  def project(conditions: Seq[Condition])(df: DataFrame): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    val aggs = conditions.zipWithIndex.map { case (c, i) =>
      max_by(when(c.column, all), when(c.column, latestKey)).as(s"match_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** `percentiles` — per-window quantiles, one row per quantile with the
    * quantile echoed (`action.clj:2845-2929`). Uses the reference's exact
    * index formula `idx = min(n-1, floor(n*q))` over metric-sorted values
    * (Riemann's `sorted-sample-extract`, `math.clj:109-131`) rather than
    * interpolation. For cluster-scale data prefer [[percentilesApprox]].
    */
  def percentiles(durationSeconds: Long, quantiles: Seq[Double], keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    percentilesSketch(durationSeconds, quantiles, keys)(df)

  /** Relational value-counts twin of [[percentiles]] — exact and
    * codegen-only: (1) count per distinct metric value within the window
    * (map-side combine, rows after = distinct values, not events);
    * (2) cumulative counts per window in metric order; (3) per quantile,
    * keep the single value whose cumulative range covers the exact index
    * idx = min(n-1, floor(n*q)) — a filter, no second aggregation. No
    * aggregation buffer ever holds more than one row.
    *
    * Measured at sf0.1/local[32]: the sketch wins (0.80s vs 1.25s warm,
    * 1.8s vs 4.9s cold) — one exchange beats two window sorts at this
    * shape, object-hash aggregation notwithstanding — so [[percentiles]]
    * dispatches to the sketch. This form remains for engines/plans where
    * a TypedImperativeAggregate is unavailable or the single wide
    * exchange dominates; the property suite pins all three formulations
    * value-identical.
    */
  def percentilesRelational(durationSeconds: Long, quantiles: Seq[Double], keys: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    // null metrics are not sortable samples — dropped up front like the
    // sketch/naive twins drop them inside their aggregates (delta: a
    // window with ONLY null metrics disappears here, yields null-metric
    // rows there; no gate or reference query observes that window)
    val part = col("window_start") +: keys.map(col)
    val vc = withWindow(df, durationSeconds)
      .filter(col("metric").isNotNull)
      .withColumn("metric", col("metric").cast("double"))
      .groupBy(part :+ col("metric"): _*)
      .agg(count(lit(1)).as("__c"))
    val byMetric = Window.partitionBy(part: _*).orderBy(col("metric"))
    val whole = Window.partitionBy(part: _*)
    val qArr = array(quantiles.map(lit): _*)
    vc.withColumn("__cum", sum(col("__c")).over(byMetric))
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("quantile", explode(qArr))
      .withColumn("__idx", least(col("__n") - 1, floor(col("__n") * col("quantile"))))
      // this value covers 0-based sorted indices [__cum - __c, __cum - 1]
      .filter(col("__cum") - col("__c") <= col("__idx") && col("__idx") < col("__cum"))
      .drop("__c", "__cum", "__n", "__idx")
  }

  /** The mergeable value-counts sketch (a
    * [[graft.functions.ExactPercentiles]] `TypedImperativeAggregate`) —
    * the gated implementation behind [[percentiles]]: one shuffle, the
    * per-group state is a value→count map bounded by DISTINCT metric
    * values (monitoring metrics repeat heavily), map-side partial
    * aggregation, exact index formula at eval. Object-hash aggregation
    * runs outside codegen but still beats the two-exchange relational
    * twin at every measured shape (see [[percentilesRelational]]).
    */
  def percentilesSketch(durationSeconds: Long, quantiles: Seq[Double], keys: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val qArr = array(quantiles.map(lit): _*)
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(graft.functions.PercentileSketch
        .exactPercentiles(col("metric").cast("double"), quantiles).as("__ms"))
      .select(col("*"), posexplode(col("__ms")).as(Seq("__qi", "metric")))
      .withColumn("quantile", element_at(qArr, col("__qi") + 1))
      .drop("__ms", "__qi")
  }

  /** The naive percentile plan — `collect_list` the window payload, sort,
    * index. Kept as the reference semantics twin for the property test;
    * [[percentiles]] computes the same values through the mergeable
    * value-counts sketch ([[graft.functions.ExactPercentiles]]) without
    * ever materializing a window's payload in one buffer.
    */
  private[graft] def percentilesNaive(durationSeconds: Long, quantiles: Seq[Double], keys: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val qArr = array(quantiles.map(lit): _*)
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(array_sort(collect_list(col("metric"))).as("sorted"))
      .withColumn("quantile", explode(qArr))
      .withColumn("metric",
        expr("sorted[cast(least(size(sorted) - 1, floor(size(sorted) * quantile)) as int)]"))
      .drop("sorted")
  }

  /** Sketch-based percentiles for the 100 TB path: constant-memory
    * per-window state, mergeable across partitions.
    */
  def percentilesApprox(durationSeconds: Long, quantiles: Seq[Double], accuracy: Int = 10000,
                        keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg(percentile_approx(col("metric"), array(quantiles.map(lit): _*), lit(accuracy)).as("metrics"))
      .select(col("window_start") +: keys.map(col) :+
        posexplode(col("metrics")).as(Seq("qi", "metric")): _*)

  /** `coll-increase` — counter increase over a window: newest minus oldest
    * metric, drop non-positive (counter reset) (`action.clj:2693-2740`).
    */
  def collIncrease(durationSeconds: Long, keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    grouped(withWindow(df, durationSeconds), durationSeconds, keys)
      .agg((max_by(col("metric"), latestKey) - min_by(col("metric"), latestKey)).as("metric"))
      .filter(col("metric") > 0)

  // --------------------------------------------------------------------
  // §2.6 collection aggregates — higher-order functions over the window
  // payload (`events` array column produced by fixedTimeWindow). These run
  // entirely inside a row (no extra shuffle).
  // --------------------------------------------------------------------

  /** `coll-mean` (`action.clj:264-284`): mean of metrics; payload = latest
    * event. A null metric counts as 0 but still divides (`math.clj:5-14`
    * folds `(:metric %2 0)` over ALL events).
    */
  def collMean(df: DataFrame): DataFrame = collAgg(df,
    aggregate(col("events"), lit(0.0),
      (acc, e) => acc + coalesce(e.getField("metric"), lit(0.0))) / size(col("events")))

  /** `coll-sum` (`action.clj:324-343`); null metric = 0 (`math.clj:64-71`). */
  def collSum(df: DataFrame): DataFrame = collAgg(df,
    aggregate(col("events"), lit(0.0),
      (acc, e) => acc + coalesce(e.getField("metric"), lit(0.0))))

  /** `coll-count` (`action.clj:1465-1487`). */
  def collCount(df: DataFrame): DataFrame = collAgg(df, size(col("events")).cast(DoubleType))

  /** `coll-rate` — sum / (maxTime - minTime) in seconds, sum if the
    * interval is zero (`math.clj:80-106`).
    */
  def collRate(df: DataFrame): DataFrame = {
    // nil metric folds as 0, as coll-sum (the reference's rate would NPE
    // on a nil metric — undefined there; 0 keeps the family consistent)
    val sumM = aggregate(col("events"), lit(0.0),
      (acc, e) => acc + coalesce(e.getField("metric"), lit(0.0)))
    val span = (array_max(transform(col("events"), _.getField("time"))) -
      array_min(transform(col("events"), _.getField("time")))).cast(DoubleType) / lit(1e9)
    collAgg(df, when(span === 0.0, sumM).otherwise(sumM / span))
  }

  /** `coll-quotient` — first metric divided by the rest sequentially
    * (`math.clj:16-26`). The reference throws on a zero divisor —
    * viable when one event's exception kills one event, not when it
    * kills a 100 TB job — so the distributed semantics here is
    * `try_divide`: a zero divisor turns that window's quotient into
    * NULL (and NULL then absorbs the rest of the fold), which is also
    * exactly DuckDB's x/0 behavior, so the oracle pins it.
    */
  def collQuotient(df: DataFrame): DataFrame = {
    val ms = transform(col("events"), _.getField("metric"))
    collAgg(df, aggregate(slice(ms, 2, 1000000), element_at(ms, 1), (acc, x) => try_divide(acc, x)))
  }

  /** `coll-max` / `coll-min` — the extreme event itself (`math.clj:39-78`). */
  def collMax(df: DataFrame): DataFrame = collPick(df, asc = false)
  def collMin(df: DataFrame): DataFrame = collPick(df, asc = true)

  /** Columns to carry through a coll-aggregate: everything except the
    * payload itself and anything shadowed by the payload's fields (group
    * keys are also event fields — the payload's copy wins).
    */
  private def carriedCols(df: DataFrame): Seq[Column] = {
    val eventFields = df.schema("events").dataType match {
      case ArrayType(s: StructType, _) => s.fieldNames.toSet
      case _ => Set.empty[String]
    }
    df.columns.filterNot(c => c == "events" || c == "event" || eventFields(c)).map(col).toSeq
  }

  /** Null-metric events are not candidates for metric-ordered picks —
    * the reference's `extremum`/`sorted-sample` skip them explicitly
    * (`math.clj:38-56,107-119`; pinned by its own `math_test.clj`).
    */
  private def withoutNullMetric: Column =
    filter(col("events"), e => e.getField("metric").isNotNull)

  private def collPick(df: DataFrame, asc: Boolean): DataFrame = {
    // reference `extremum` reduces with >= / <= over arrival order
    // (`math.clj:38-56`): among metric-TIED events the LATEST wins, for
    // max AND min — so the pick's tie-break is eventId DESC in both
    // directions (unlike the stable sorts below)
    val sorted = array_sort(col("events"), (a, b) => {
      val (x, y) = if (asc) (a, b) else (b, a)
      when(x.getField("metric") < y.getField("metric"), -1)
        .when(x.getField("metric") > y.getField("metric"), 1)
        .when(a.getField("eventId") > b.getField("eventId"), -1)
        .when(a.getField("eventId") < b.getField("eventId"), 1)
        .otherwise(0)
    })
    val carried = carriedCols(df)
    df.withColumn("events", withoutNullMetric)
      .filter(size(col("events")) > 0) // all-null payload → no event (math.clj extremum → nil)
      .withColumn("event", element_at(sorted, 1)).drop("events")
      .select(carried :+ col("event.*"): _*)
  }

  /** Metric order with STABLE ties (arrival = eventId ascending, in both
    * directions) — the reference's `sort-by`/`sorted-sample` are stable
    * Clojure sorts, so metric-tied events keep arrival order.
    */
  private def sortedByMetric(asc: Boolean): Column =
    array_sort(col("events"), (a, b) => {
      val (x, y) = if (asc) (a, b) else (b, a)
      when(x.getField("metric") < y.getField("metric"), -1)
        .when(x.getField("metric") > y.getField("metric"), 1)
        .when(a.getField("eventId") < b.getField("eventId"), -1)
        .when(a.getField("eventId") > b.getField("eventId"), 1)
        .otherwise(0)
    })

  /** `coll-percentiles` — event-identity quantiles over the window payload
    * (`action.clj:1528-1556`, `math.clj:109-138`): events sorted by metric,
    * the event at `idx = min(n-1, floor(n*q))` is emitted once per
    * quantile, with the quantile echoed in `attributes.quantile` (string,
    * as the reference does) and as a `quantile` column.
    */
  def collPercentiles(quantiles: Seq[Double])(df: DataFrame): DataFrame = {
    val carried = carriedCols(df)
    val out = df.withColumn("events", withoutNullMetric)
      .filter(size(col("events")) > 0) // sorted-sample of no samples → '()
      .withColumn("__sorted", sortedByMetric(asc = true)).drop("events")
      .withColumn("quantile", explode(array(quantiles.map(lit): _*)))
      .withColumn("event",
        expr("__sorted[cast(least(size(__sorted) - 1, floor(size(__sorted) * quantile)) as int)]"))
      .select(carried ++ Seq(col("quantile"), col("event.*")): _*)
    if (out.columns.contains("attributes"))
      out.withColumn("attributes",
        map_concat(coalesce(col("attributes"), map()),
          map(lit("quantile"), col("quantile").cast(StringType))))
    else out
  }

  /** `coll-top` / `coll-bottom` — top/bottom N events by metric
    * (`action.clj:2007-2051`).
    */
  def collTop(n: Int)(df: DataFrame): DataFrame =
    df.withColumn("events", withoutNullMetric)
      .withColumn("events", slice(sortedByMetric(asc = false), 1, n))
  def collBottom(n: Int)(df: DataFrame): DataFrame =
    df.withColumn("events", withoutNullMetric)
      .withColumn("events", slice(sortedByMetric(asc = true), 1, n))

  /** `coll-sort` — sort the payload by a field (`action.clj:368-389`). */
  def collSort(field: String)(df: DataFrame): DataFrame =
    df.withColumn("events", array_sort(col("events"), (a, b) =>
      when(a.getField(field) < b.getField(field), -1)
        .when(a.getField(field) > b.getField(field), 1)
        .when(a.getField("eventId") < b.getField("eventId"), -1)
        .when(a.getField("eventId") > b.getField("eventId"), 1)
        .otherwise(0)))

  /** `coll-where` — filter inside the payload (`action.clj:115-137`)
    * with the full condition language (and/or nesting, nested paths like
    * `attributes.x`, regex, contains), compiled against the payload's
    * struct elements instead of top-level columns.
    */
  def collWhere(condition: Condition)(df: DataFrame): DataFrame =
    df.withColumn("events", filter(col("events"), e =>
      Condition.compileWith(condition, f =>
        f.path.tail.foldLeft(e.getField(f.path.head))((c, k) => c.getItem(k)))))

  /** Single-comparison convenience form of [[collWhere]]. */
  def collWhere(field: String, op: String, value: Any)(df: DataFrame): DataFrame =
    collWhere(Condition.parse(Seq(op, field, value)))(df)

  /** Shared shape for scalar coll-aggregates: metric := agg(payload),
    * other fields from the latest event in the payload.
    */
  private def collAgg(df: DataFrame, metricExpr: Column): DataFrame = {
    val latest = element_at(array_sort(col("events"), (a, b) =>
      when(a.getField("time") > b.getField("time"), -1)
        .when(a.getField("time") < b.getField("time"), 1)
        .when(a.getField("eventId") > b.getField("eventId"), -1)
        .when(a.getField("eventId") < b.getField("eventId"), 1)
        .otherwise(0)), 1)
    val carried = carriedCols(df)
    df.withColumn("__m", metricExpr)
      .withColumn("event", latest)
      .drop("events")
      .select(carried ++ Seq(col("event.*"), col("__m")): _*)
      .drop("metric").withColumnRenamed("__m", "metric")
  }
}
