package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixtures (`TESTDATA.md`) and
  * the canonical event view the operator suite runs on.
  *
  * The `events` table's `ts` column has shipped as both parquet
  * `TIMESTAMP(NANOS)` (read as a nanosecond `LongType` under the legacy
  * conf below) and `TIMESTAMP(MICROS)` (read as a Spark timestamp) across
  * fixture generations. Either way [[eventsRaw]] canonicalizes it to an
  * epoch-NANOSECOND long — that is exactly the reference's time
  * representation (`src/clojure/mirabelle/time.clj:3-6`), so the engine
  * keeps event time as ns-longs end to end and derives µs `TimestampType`
  * only at the streaming boundary. The DuckDB oracle's `epoch_ns(ts)`
  * agrees with both physical types.
  */
object Tables {

  private def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$sfDir/$name.parquet")

  /** Small-scan parallelization guard. A single-row-group parquet file
    * scans as ONE task no matter how many cores exist (row groups are the
    * split unit), which serializes the whole map side — tokenization,
    * hashing, `from_json` — on one core. Production-scale inputs arrive in
    * thousands of splits, so this fan-out is a no-op there (partitions
    * already ≥ cores); it only triggers on under-split inputs, where the
    * round-robin shuffle it adds costs far less than the parallelism it
    * buys downstream.
    */
  private val splitCounts = scala.collection.concurrent.TrieMap[String, Int]()

  private def fanOut(df: DataFrame, path: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // cache key carries the session and the file's mtime: a regenerated
    // file (different row-group count) or a new session (different split
    // config) re-probes instead of reusing a stale split count
    val mtime = scala.util.Try(
      java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
    ).getOrElse(0L)
    val key = s"${System.identityHashCode(df.sparkSession)}:$path@$mtime"
    // .rdd forces physical planning (~0.4 s driver time) — probe once per key
    val splits = splitCounts.getOrElseUpdate(key, df.rdd.getNumPartitions)
    if (splits < target) df.repartition(target) else df
  }

  /** Fact tables get the fan-out guard; dimension tables stay as-is (they
    * broadcast — an extra shuffle before a broadcast is pure overhead).
    */
  private def fact(spark: SparkSession, sfDir: String, name: String): DataFrame =
    fanOut(table(spark, sfDir, name), s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = fact(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = fact(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = fact(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = fact(spark, sfDir, "embeddings")
  /** Raw events with `ts` canonicalized to an epoch-ns long regardless of
    * the fixture's physical parquet type (see the object Scaladoc). The
    * µs→ns widening is exact integer arithmetic (`unix_micros * 1000` —
    * ns-longs exceed 2^53, so no double ever touches them) and session
    * time zone is pinned UTC by every entrypoint, matching DuckDB's
    * UTC-naive `epoch_ns`.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir, fanOut = true)

  /** `fanOut = false` skips the small-scan fan-out guard: for consumers
    * whose FIRST operation is a key exchange (the wire-encode harnesses'
    * `groupByKey`), the guard's round-robin shuffle is paid and then
    * immediately re-partitioned away by the key exchange — pure overhead
    * on under-split local inputs, a no-op at production split counts.
    */
  def eventsRaw(spark: SparkSession, sfDir: String, fanOut: Boolean): DataFrame = {
    val df = if (fanOut) fact(spark, sfDir, "events")
             else table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }

  /** Canonical event view over the driver's `events` table, mapping its
    * columns onto the reference event model (SURVEY §1.1):
    * `ts`→`time` (ns long), `user_id`→`host`, `event_type`→`service`,
    * `value`→`metric`, `props` JSON→`attributes`, a state derived from the
    * metric (so state-transition operators have transitions to see), and
    * deterministic tags. `event_id` is kept as a stable tie-break id.
    *
    * The DuckDB oracle mirrors this mapping 1:1 — see
    * [[graft.OracleViews.EventsView]].
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir, fanOut = true)

  /** See [[eventsRaw]] on `fanOut = false` (pre-key-exchange consumers). */
  def events(spark: SparkSession, sfDir: String, fanOut: Boolean): DataFrame =
    eventsRaw(spark, sfDir, fanOut).select(
      col("event_id").as("eventId"),
      // µs-aligned ns: DuckDB (the correctness oracle) reads parquet
      // TIMESTAMP(NANOS) at µs precision, so the canonical view pins the
      // same truncation. Integer arithmetic only — ns longs exceed 2^53.
      expr("(ts div 1000) * 1000").as("time"),
      col("user_id").cast(StringType).as("host"),
      col("event_type").as("service"),
      lit("events").as("name"),
      when(col("value") > 150, "critical")
        .when(col("value") > 100, "warning")
        .otherwise("ok").as("state"),
      col("value").as("metric"),
      lit(Event120Ttl).as("ttl"),
      col("props").as("description"),
      array(col("event_type"), concat(lit("u"), pmod(col("user_id"), lit(10)))).as("tags"),
      from_json(col("props"), MapType(StringType, StringType)).as("attributes")
    )

  private val Event120Ttl: Double = graft.model.Event.DefaultTtlSeconds
}

/** Fixture fingerprints — per table `(path, mtime, rows, schema-hash)` —
  * stamped into Bench's detail JSON line and Verify's `fixtures.json`.
  *
  * Why: the driver regenerates `/root/testdata` between rounds; when that
  * happens mid-cycle, every cross-round per-query time comparison silently
  * becomes apples-to-oranges (a whole perf investigation was burned proving
  * a "regression" was really a fixture change). With the fingerprint block
  * in each artifact, fixture churn is self-announcing: identical blocks ⇒
  * comparable numbers, differing blocks ⇒ compare shapes, not seconds.
  *
  * Cost: one metadata-level `count()` per table (parquet row-group stats,
  * no column IO) plus a footer schema read — negligible next to one bench
  * pass, and paid once per invocation.
  */
object Fixtures {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** JSON object `{table: {path, mtime, rows, schema}}` for every fixture
    * present in `sfDir`; missing tables are omitted rather than failing the
    * artifact (a bench must still emit numbers on a partial dir).
    */
  /** Minimal JSON string escape — `path` is caller-supplied and a quote /
    * backslash / control char in a directory name must not produce an
    * unparseable fixtures.json.
    */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def json(spark: SparkSession, sfDir: String): String = {
    val entries = tableNames.flatMap { name =>
      val path = s"$sfDir/$name.parquet"
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) None
      else scala.util.Try {
        val mtime = java.nio.file.Files.getLastModifiedTime(p).toMillis
        val df = Tables.table(spark, sfDir, name)
        val rows = df.count()
        val schemaHash = java.security.MessageDigest.getInstance("MD5")
          .digest(df.schema.json.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        s""""$name":{"path":${jstr(path)},"mtime":$mtime,"rows":$rows,"schema":"$schemaHash"}"""
      }.toOption
    }
    entries.mkString("{", ",", "}")
  }
}
