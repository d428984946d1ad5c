package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark's built-in operators don't express directly.
  *
  * The flagship is the as-of join: for each left row, attach the single
  * most recent right row with `right.time <= left.time` in the same key
  * group (the quotes-to-trades join; here: "the last error state a user
  * saw before this event").
  *
  * Scale design — the union-merge formulation, not a range join:
  * a naive `l JOIN r ON l.key = r.key AND r.t <= l.t` explodes to
  * O(|l|·|r|) per key before the top-1 filter; a broadcast-range AQE plan
  * still materializes every qualifying pair. Instead both sides are
  * UNIONed into one frame ordered by (key, time, side, order), and a
  * running `last(value, ignoreNulls)` window carries the latest right
  * payload forward into each left row:
  *
  *   - exactly ONE shuffle (on the key) + one sort — the same cost as a
  *     single window aggregate, independent of match fan-out;
  *   - no pair materialization: memory is O(window frame) = O(1) rows
  *     per step with the running frame;
  *   - at 100 TB both inputs stream through ExternalSort; skewed keys
  *     behave like any windowed op (AQE-visible, saltable upstream).
  */
object Joins {

  /** As-of join `left ⟕asof right`.
    *
    * @param keys       equi-join key columns (present on both sides)
    * @param timeCol    event-time column (present on both sides; any
    *                   orderable type — the fixtures use ns longs)
    * @param valueCols  right-side payload columns to attach
    * @param rightOrder tie-break among right rows with equal time (e.g.
    *                   an event id); the LAST row in `(time, rightOrder)`
    *                   order wins, and right rows at exactly the left
    *                   row's time DO match (`<=` semantics)
    * @param prefix     name prefix for the attached columns (also applied
    *                   to the right time, exported as `<prefix><timeCol>`)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      rightOrder: String,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asof: at least one key column")
    val leftStruct = struct(left.columns.map(col): _*)
    val rightTypes = right.schema
    val payload = valueCols :+ timeCol // carried right columns (time last)

    val common = keys.map(col) :+ col(timeCol).as("__t")
    val lu = left.select(
      (Seq(leftStruct.as("__l"), lit(1).as("__side"), lit(null).cast("long").as("__ord")) ++
        common ++
        payload.map(c => lit(null).cast(rightTypes(c).dataType).as(s"__rv_$c"))): _*)
    val ru = right.select(
      (Seq(lit(null).cast(lu.schema("__l").dataType).as("__l"), lit(0).as("__side"),
        col(rightOrder).cast("long").as("__ord")) ++
        common ++
        payload.map(c => col(c).as(s"__rv_$c"))): _*)

    // right sorts before left at equal time (<= semantics); among right
    // rows the (time, rightOrder)-max is the frame's last non-null
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lu.unionByName(ru)
      .select(col("__l") +: col("__side") +:
        payload.map(c => last(col(s"__rv_$c"), ignoreNulls = true).over(w)
          .as(s"$prefix$c")): _*)
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(c => col(s"$prefix$c")): _*)
  }

  /** Interval (range) join: every (left event, right interval) pair with
    * `l.key = r.key AND r.start <= l.ts <= r.end` — "which incident
    * windows contain this event", one output row per containing interval.
    *
    * Scale design — bucketized equi-join, NOT an inequality join: Spark
    * plans a bare `ON start <= ts AND ts <= end` as broadcast-nested-loop
    * (or cartesian) — O(|l|·|r|) pair evaluation. Here both sides map
    * onto fixed-width time buckets: an interval explodes to one row per
    * bucket it overlaps (⌈span/width⌉+1 rows), an event lands in exactly
    * one bucket, and the join is a plain shuffled equi-join on
    * (keys, bucket) plus the exact range filter. Shuffle volume is
    * |l| + Σ span/width — pick `bucketWidth` near the typical interval
    * span so typical intervals explode to ~2 rows. Bucket indexes use
    * floor division built from integer ops only (`(x - pmod(x,w)) div w`
    * — ns longs never pass through doubles, and negative times bucket
    * correctly).
    *
    * @param valueCols right-side payload columns attached as
    *                  `<prefix><name>`; `rightStart`/`rightEnd` are
    *                  always attached the same way
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightStart: String,
      rightEnd: String,
      valueCols: Seq[String],
      keys: Seq[String] = Nil,
      bucketWidth: Long = 60L * 1000000000L,
      prefix: String = "r_",
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "rangeJoin: maxBucketsPerInterval must be positive")
    // floor division from integer ops only: x - pmod(x, w) is the largest
    // multiple of w <= x, and `div` on the named column stays integral.
    // That subtraction underflows for timestamps within bucketWidth of
    // Long.MinValue — under ANSI mode a garbage value would throw an
    // opaque ARITHMETIC_OVERFLOW before any later guard runs, so compute
    // it with try_subtract and raise the named diagnostic on NULL
    def withBucket(df: DataFrame, src: Column, out: String): DataFrame =
      df.withColumn("__t0",
          when(src.isNotNull && try_subtract(src, pmod(src, lit(bucketWidth))).isNull,
            raise_error(concat(lit("rangeJoin: timestamp "), src.cast("string"),
              lit(" overflows bucket arithmetic — clean the value or raise bucketWidth")))
              .cast("long"))
            .otherwise(try_subtract(src, pmod(src, lit(bucketWidth)))))
        .withColumn(out, expr(s"__t0 div $bucketWidth"))
        .drop("__t0")
    val lb = withBucket(left, col(leftTs), "__b")
    val payload = (valueCols :+ rightStart :+ rightEnd).distinct
    val rPruned = right.select(
      keys.map(col) ++ Seq(col(rightStart).as("__s"), col(rightEnd).as("__e")) ++
        payload.map(c => col(c).as(s"$prefix$c")): _*)
      .filter(col("__s") <= col("__e"))
    // one wide/corrupt interval (an open-ended sentinel end, a garbage
    // timestamp) would otherwise build a sequence() of billions of
    // buckets and kill the whole job with an opaque error — fail loudly,
    // per offending row, with the knob to turn
    // the magnitude test runs in DOUBLE: a Long.MinValue..Long.MaxValue
    // garbage interval would overflow a long subtraction to a small
    // number and sneak past the guard (precision loss near the cap
    // boundary is irrelevant for a sanity threshold)
    val span = col("__be").cast("double") - col("__bs").cast("double")
    val rb = withBucket(withBucket(rPruned, col("__s"), "__bs"), col("__e"), "__be")
      .withColumn("__b", explode(
        when(span < lit(maxBucketsPerInterval.toDouble),
          sequence(col("__bs"), col("__be")))
          .otherwise(raise_error(concat(
            // string, not long: an ANSI cast of a huge double would throw
            // its own error inside the error message
            lit("rangeJoin: interval spans ~"), (span + 1).cast("string"),
            lit(s" buckets (cap $maxBucketsPerInterval) — raise bucketWidth/maxBucketsPerInterval or clean the interval"))))))
      .drop("__bs", "__be")
    lb.join(rb, (keys :+ "__b").toSeq)
      .filter(col("__s") <= col(leftTs) && col(leftTs) <= col("__e"))
      .drop("__b", "__s", "__e")
  }

  /** Salted equi-join — the hot-key lever for fact×fact joins AQE's
    * skew splitting can't always reach (skew-join rewrites apply to
    * sort-merge stages; a pathological key can still pin one task).
    * The BIG side's rows scatter across `salts` sub-keys by a
    * deterministic hash of `bigIdCol`; the SMALL side replicates once
    * per salt value (an explode, ×salts rows — keep the smaller input
    * on this side). The join key becomes `(key, salt)`, so one hot
    * key's probe rows spread over `salts` tasks instead of one.
    *
    * Result-identical to `big.join(small, key)` by construction: every
    * big row still meets every small row with its key — exactly once,
    * under exactly one salt. The identity (and the skew fixture) is
    * pinned in QualityJoinsSpec; the oracle gates the plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, bigIdCol: String): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    val saltedBig = big.withColumn("__salt",
      pmod(graft.functions.Text.md5Hash64(
        concat_ws(":", lit("sj"), col(bigIdCol).cast("string"))), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew profile — the pre-flight diagnostic for any corpus-scale
    * `groupBy`/`join`: the `topK` heaviest keys with their count, rank,
    * corpus share, cumulative top-k share, and a recommended
    * [[saltedJoin]] salt count (`ceil(cnt / targetPerTask)` — the
    * number of sub-keys that caps each task's probe volume at
    * `targetPerTask` rows). Run it on yesterday's partition before
    * committing a plan: `share` near `1/shufflePartitions` is where one
    * task's runtime detaches from the median, and `salt_hint > 1` rows
    * are exactly the keys AQE's sort-merge skew split may not reach
    * (broadcast-hash stages, aggregates with huge per-key state).
    *
    * Multi-column keys are canonicalized as a `'|'`-joined string with
    * nulls spelled `<null>` (so a null-heavy foreign key — the classic
    * hidden hot key — surfaces instead of vanishing).
    *
    * Scale shape: ONE map-side-combined count aggregate (the only
    * corpus-sized exchange — hot keys collapse per input partition
    * before travel), a `TakeOrderedAndProject` top-k (no full-
    * cardinality window: the rank/cumsum windows run AFTER the `limit`,
    * over `topK` rows), and a 1-row total cross-joined in. Output
    * ordered by `rank`.
    */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String], topK: Int = 20,
                     targetPerTask: Long = 5000000L): DataFrame = {
    require(keyCols.nonEmpty, "keySkewProfile: keyCols must be non-empty")
    require(topK >= 1, s"keySkewProfile: topK must be >= 1, got $topK")
    require(targetPerTask >= 1,
      s"keySkewProfile: targetPerTask must be >= 1, got $targetPerTask")
    val key = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    val counts = df.select(key.as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(counts.agg(sum(col("cnt")).as("__n")))
      .select(col("key"), col("cnt"), col("rank"),
        (col("cnt").cast("double") / col("__n")).as("share"),
        (col("__cum").cast("double") / col("__n")).as("cum_share"),
        expr(s"(cnt + ${targetPerTask - 1L}) DIV $targetPerTask")
          .cast("long").as("salt_hint"))
      .orderBy(col("rank"))
  }
}
