package graft.operators

import graft.conditions.Condition
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stateless event operators (SURVEY §2.2 filters + §2.3 transforms).
  *
  * Every operator is pure `Column` algebra over the event DataFrame —
  * Catalyst fuses adjacent projections, pushes the filters into the scan
  * and codegens the lot, so chains of these cost one pass over the data
  * regardless of length (unlike the reference's per-event closure tree,
  * `src/clojure/mirabelle/action.clj:74-77`).
  */
object Stateless {

  /** `where` — keep events matching a condition (`action.clj:79-113`). */
  def where(c: Condition)(df: DataFrame): DataFrame = df.filter(c.column)

  /** `over` / `under` — metric strictly above/below n (`action.clj:1279-1327`). */
  def over(n: Double)(df: DataFrame): DataFrame = df.filter(col("metric") > n)
  def under(n: Double)(df: DataFrame): DataFrame = df.filter(col("metric") < n)

  /** `tagged-all` — all given tags present (`action.clj:1006-1039`,
    * `event.clj:46-50`): size(array_intersect(tags, wanted)) = size(wanted).
    */
  def taggedAll(tags: Seq[String])(df: DataFrame): DataFrame = {
    val wanted = array(tags.map(lit): _*)
    df.filter(size(array_intersect(col("tags"), wanted)) === tags.size)
  }

  /** `expired` / `not-expired` (`action.clj:427-474`, `event.clj:12-19`):
    * an event is expired when `state = "expired"` or its age against the
    * stream clock (running max event time in the reference; here the batch
    * max, in streaming the watermark) exceeds its TTL. `ttl` defaults to
    * 120 s when absent.
    */
  def expiredPredicate(clockNs: Column): Column =
    col("state") === "expired" ||
      (clockNs - col("time")) >
        (coalesce(col("ttl"), lit(graft.model.Event.DefaultTtlSeconds)) * lit(1000000000L)).cast(LongType)

  def expired(clockNs: Column)(df: DataFrame): DataFrame = df.filter(expiredPredicate(clockNs))
  def notExpired(clockNs: Column)(df: DataFrame): DataFrame = df.filter(!expiredPredicate(clockNs))

  /** Batch twin of expired/not-expired: clock = max event time of the
    * whole input, computed without a shuffle-join via a scalar agg that
    * Spark broadcasts (single-row cross join is a BroadcastNestedLoopJoin
    * over one row — constant cost at any scale).
    */
  def notExpiredBatch(df: DataFrame): DataFrame = expiredBatch(df, keep = false)

  def expiredBatch(df: DataFrame, keep: Boolean = true): DataFrame = {
    val clock = df.agg(max(col("time")).as("__clock"))
    val pred = expiredPredicate(col("__clock"))
    df.crossJoin(broadcast(clock)).filter(if (keep) pred else !pred).drop("__clock")
  }

  /** `split` — first-matching-condition routing (`action.clj:1109-1161`).
    * Returns a routing column usable to demux; `branch(i)` selects one arm,
    * index = conditions.size is the default branch.
    */
  def splitRoute(conditions: Seq[Condition]): Column =
    conditions.zipWithIndex.foldRight(lit(conditions.size)) { case ((c, i), acc) =>
      when(c.column, lit(i)).otherwise(acc)
    }

  def splitBranch(conditions: Seq[Condition], branch: Int)(df: DataFrame): DataFrame =
    df.filter(splitRoute(conditions) === branch)

  /** `increment` / `decrement` — metric ± 1 (`action.clj:139-175`). */
  def increment(df: DataFrame): DataFrame = df.withColumn("metric", col("metric") + 1)
  def decrement(df: DataFrame): DataFrame = df.withColumn("metric", col("metric") - 1)

  /** `scale` — metric × factor (`action.clj:1085-1107`). */
  def scale(factor: Double)(df: DataFrame): DataFrame =
    df.withColumn("metric", col("metric") * factor)

  /** `with` — set field(s) to literal values (`action.clj:823-883`);
    * nested `attributes.*` paths update the attributes map.
    */
  def withFields(fields: Map[String, Any])(df: DataFrame): DataFrame =
    fields.foldLeft(df) { case (d, (k, v)) =>
      if (k.startsWith("attributes.")) {
        val key = k.stripPrefix("attributes.")
        d.withColumn("attributes",
          map_concat(
            coalesce(col("attributes"), map()),
            map(lit(key), lit(v).cast(StringType))))
      } else d.withColumn(k, lit(v))
    }

  /** `default` — set field iff currently null (`action.clj:649-688`). */
  def default(field: String, value: Any)(df: DataFrame): DataFrame =
    df.withColumn(field, coalesce(col(field), lit(value)))

  /** `sdissoc` — drop keys, nested attribute keys included (`action.clj:1489-1526`). */
  def sdissoc(keys: Seq[String])(df: DataFrame): DataFrame = {
    val (nested, top) = keys.partition(_.startsWith("attributes."))
    val dropped = df.drop(top: _*)
    if (nested.isEmpty) dropped
    else {
      val names = array(nested.map(k => lit(k.stripPrefix("attributes."))): _*)
      dropped.withColumn("attributes",
        map_filter(col("attributes"), (k, _) => !array_contains(names, k)))
    }
  }

  /** `keep-keys` — project to a key subset (`action.clj:2196-2228`). */
  def keepKeys(keys: Seq[String])(df: DataFrame): DataFrame =
    df.select(keys.map(col): _*)

  /** `rename-keys` — move fields, nested↔top included (`action.clj:2140-2194`).
    *
    * Reference semantics, applied pair by pair: when the source value is
    * present the pair removes the source key and assocs the value at the
    * destination (overriding any existing value); events without the
    * source value pass unchanged. `attributes.x` addresses the nested
    * attributes map on either side, so all four move shapes work:
    * top→top, top→`attributes.y`, `attributes.x`→top,
    * `attributes.x`→`attributes.y`. In the columnar model "absent key" is
    * a null value, so a fully-moved top-level source column is dropped.
    */
  def renameKeys(renames: Seq[(String, String)])(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => renameKey(d, from, to) }

  /** Map overload for NON-interacting renames only: a plain Map has no
    * defined order past 4 entries, and interacting pairs (chains like
    * host→hostname, hostname→x) must apply in document order — use the
    * Seq form for those (the IR path does, via the order-preserving
    * ListMap from [[graft.ir.Node.anyOf]]).
    */
  def renameKeys(renames: Map[String, String])(df: DataFrame): DataFrame =
    renameKeys(renames.toSeq)(df)

  private def renameKey(df: DataFrame, from: String, to: String): DataFrame = {
    if (from == to) return df
    val fromNested = from.startsWith("attributes.")
    // reference semantics: a pair whose source key is absent passes events
    // unchanged — columnar "absent for every event" = the column not existing
    if (!fromNested && !df.columns.contains(from)) return df
    val toNested = to.startsWith("attributes.")
    val src: Column =
      if (fromNested) col("attributes").getItem(from.stripPrefix("attributes."))
      else col(from)
    val srcType: DataType =
      if (fromNested) StringType else df.schema(from).dataType
    // Stage the moved value first: the source read must not observe the
    // attributes rewrite below.
    val d0 = df.withColumn("__mv", src)
    val moved = col("__mv").isNotNull
    val d1 =
      if (fromNested) {
        val k = lit(from.stripPrefix("attributes."))
        d0.withColumn("attributes",
          when(moved, map_filter(col("attributes"), (key, _) => key =!= k))
            .otherwise(col("attributes")))
      } else d0 // top-level source dropped below, after the target assignment
    val d2 =
      if (toNested) {
        val k = lit(to.stripPrefix("attributes."))
        d1.withColumn("attributes",
          when(moved,
            map_concat(
              map_filter(coalesce(col("attributes"), map()), (key, _) => key =!= k),
              map(k, col("__mv").cast(StringType))))
            .otherwise(col("attributes")))
      } else {
        val tgtType = if (d1.columns.contains(to)) d1.schema(to).dataType else srcType
        val fallback =
          if (d1.columns.contains(to)) col(to) else lit(null).cast(tgtType)
        d1.withColumn(to, coalesce(col("__mv").cast(tgtType), fallback))
      }
    val d3 = if (!fromNested) d2.drop(from) else d2
    d3.drop("__mv")
  }

  /** `tag` — add tag(s), keeping the set distinct (`action.clj:939-970`). */
  def tag(ts: Seq[String])(df: DataFrame): DataFrame =
    df.withColumn("tags",
      array_distinct(concat(coalesce(col("tags"), array()), array(ts.map(lit): _*))))

  /** `untag` — remove tag(s) (`action.clj:972-1003`). */
  def untag(ts: Seq[String])(df: DataFrame): DataFrame =
    df.withColumn("tags", array_except(col("tags"), array(ts.map(lit): _*)))

  /** `sformat` — printf template over N fields into a target field
    * (`action.clj:1929-1981`).
    */
  def sformat(template: String, target: String, fields: Seq[String])(df: DataFrame): DataFrame =
    df.withColumn(target, format_string(template, fields.map(col): _*))

  /** `to-string` — stringify a field, null → "" (`action.clj:2934-2965`). */
  def toStringField(field: String)(df: DataFrame): DataFrame =
    df.withColumn(field, coalesce(col(field).cast(StringType), lit("")))

  /** `to-base64` / `from-base64` (`action.clj:1868-1927`). */
  def toBase64(field: String)(df: DataFrame): DataFrame =
    df.withColumn(field, base64(col(field).cast(BinaryType)))
  def fromBase64(field: String)(df: DataFrame): DataFrame =
    df.withColumn(field, unbase64(col(field)).cast(StringType))

  /** `from-json` — parse a JSON-string field (`action.clj:1753-1787`);
    * permissive string map by default, or a caller-supplied schema.
    */
  def fromJson(field: String, schema: DataType = MapType(StringType, StringType))(df: DataFrame): DataFrame =
    df.withColumn(field, from_json(col(field), schema))

  /** `extract` — replace the event by the value of one nested key
    * (`action.clj:2797-2831`).
    */
  def extract(field: String)(df: DataFrame): DataFrame =
    df.select(col(field + ".*"))

  /** `iterate-on` — explode an array field into one event per element
    * (`action.clj:3011-3035`).
    */
  def iterateOn(src: String, dst: String)(df: DataFrame): DataFrame =
    df.withColumn(dst, explode(col(src))).drop(src)

  /** `sflatten` — flatten a window list back into individual events
    * (`action.clj:915-936`).
    */
  def sflatten(listCol: String)(df: DataFrame): DataFrame =
    df.select(explode(col(listCol)).as("event")).select(col("event.*"))

  /** `debug` / `info` / `error` — log each event as JSON at the given
    * level and pass it through (`action.clj:176-236` `log-action`). Logs
    * land per executor under the `graft.stream` logger.
    *
    * Level checks happen in two places, both documented behavior: a
    * DRIVER-side, PLAN-CONSTRUCTION-time shortcut returns the input plan
    * unchanged when the level is disabled — so a `(debug)` left in a
    * production pipeline costs literally nothing, at the price that a
    * long-lived registered stream built while the level was off never
    * starts logging after a runtime log-level change (rebuild/re-add the
    * stream to pick it up). When the plan shortcut does NOT fire, each
    * executor re-checks its own logger per partition at runtime, so
    * executors with stricter log4j configs than the driver skip the JSON
    * rendering cost too.
    */
  def logEvents(level: String)(df: DataFrame): DataFrame = {
    val logger = org.apache.logging.log4j.LogManager.getLogger("graft.stream")
    val enabled = level match {
      case "debug" => logger.isDebugEnabled
      case "info"  => logger.isInfoEnabled
      case _       => logger.isErrorEnabled
    }
    if (!enabled) df
    else {
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
      val lvl = level
      df.mapPartitions { rows =>
        val log = org.apache.logging.log4j.LogManager.getLogger("graft.stream")
        val on = lvl match {
          case "debug" => log.isDebugEnabled
          case "info"  => log.isInfoEnabled
          case _       => log.isErrorEnabled
        }
        if (!on) rows
        else rows.map { r =>
          val line = try r.json catch { case _: Throwable => r.toString }
          lvl match {
            case "debug" => log.debug(line)
            case "info"  => log.info(line)
            case _       => log.error(line)
          }
          r
        }
      }(enc)
    }
  }
}
