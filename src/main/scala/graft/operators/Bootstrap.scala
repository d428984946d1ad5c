package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap uncertainty estimates for corpus metrics — the
  * distributed bootstrap (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", Google 2012; Kleiner et al.'s BLB is the
  * subsample cousin): classic resampling draws n rows WITH replacement
  * per replicate — undoable at 100 TB — but the multinomial resample
  * count of each row converges to an independent Poisson(1), so each
  * row can locally mint its own per-replicate weights and every
  * replicate mean becomes one weighted aggregate. No resample
  * materialization, no driver loop: ONE pass over the corpus emitting
  * `R` weighted contributions per row (map-side combined), one exchange
  * of `groups × R` partial rows.
  *
  * Determinism: the weight is the inverse-CDF bucket of
  * `u = md5Hash64(salt:rep:id) / 2^60` against [[Bootstrap.PoissonCdf]]
  * — both engines parse the SAME decimal literals and compare the same
  * exact division, so replicate weights (and therefore means) are
  * bit-identical cross-engine. Weighted sums round through
  * `DECIMAL(38,9)` per the repo's sum convention.
  *
  * A replicate that samples zero rows of a group (probability `e^-n`,
  * real only for near-empty groups) is absent from the output rather
  * than NaN.
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities for k = 0..8 as decimal-string
    * literals — the SINGLE source of truth shared by the Column algebra
    * and the DuckDB oracle SQL (both parse these exact strings; weights
    * cap at 9 with cumulative mass ~1.1e-9 left).
    */
  val PoissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402")

  private val TwoPow60 = "1152921504606846976.0"

  /** Poisson(1) draw from a uniform column: `#{k : u >= cdf_k}`. */
  private def poissonWeight(u: Column): Column =
    PoissonCdf.foldLeft(lit(0)) { (acc, c) =>
      acc + when(u >= lit(c.toDouble), lit(1)).otherwise(lit(0))
    }

  /** Per-replicate Poisson weights array for one row id. */
  private def weights(idCol: String, r: Int, salt: String): Column =
    transform(sequence(lit(0), lit(r - 1)), rep =>
      poissonWeight(
        Text.md5Hash64(concat(lit(s"$salt:"), rep.cast("string"), lit(":"),
          col(idCol).cast("string"))) / lit(TwoPow60.toDouble)))

  /** Bootstrap replicate means of `valCol` per group: `(groupCols...,
    * rep, mean)` — `r` replicates, each the Poisson-weighted mean of the
    * group's values. One corpus pass + one `groups × r` exchange.
    */
  def replicateMeans(df: DataFrame, valCol: String, idCol: String,
                     groupCols: Seq[String], r: Int,
                     salt: String = "bs"): DataFrame = {
    require(r >= 1, s"replicateMeans: r must be >= 1, got $r")
    val cols = (groupCols.map(col) :+ col(idCol) :+ col(valCol)) :+
      posexplode(weights(idCol, r, salt)).as(Seq("rep", "w"))
    df.select(cols: _*)
      .filter(col("w") > 0)
      .groupBy((groupCols.map(col) :+ col("rep")): _*)
      .agg(
        sum((col(valCol).cast("double") * col("w")).cast("decimal(38,9)")).as("__s"),
        sum(col("w")).cast("long").as("__wn"))
      .select((groupCols.map(col) :+ col("rep").cast("long").as("rep") :+
        (col("__s").cast("double") / col("__wn").cast("double")).as("mean")): _*)
  }

  /** Percentile-bootstrap confidence interval per group: `(groupCols...,
    * n, point, ci_lo, ci_hi)` at level `1 - alpha` from the replicate
    * means (empirical quantiles at index `floor(alpha/2·(m−1))` /
    * `ceil((1−alpha/2)·(m−1))` of the sorted means, where `m` is the
    * number of replicates PRESENT for the group — a replicate that
    * sampled zero rows is absent from [[replicateMeans]] by contract, so
    * indexing against `r` would read past the collected list for small
    * groups (`m < r` with probability `1-(1-e^-n)^r`). Quantiles over
    * the present replicates treat an empty resample as missing — the
    * bias is O(e^-n), negligible for n ≳ 20 and documented here rather
    * than silently truncated. A group whose EVERY replicate was empty
    * (probability `e^-nr`) keeps its `n`/`point` row with null CI
    * bounds. Deterministic, no interpolation. The replicate frame is at
    * most `groups × r` rows — sorting it per group via
    * `sort_array(collect_list(...))` is model-sized work, never
    * corpus-sized.
    */
  def confidenceInterval(df: DataFrame, valCol: String, idCol: String,
                         groupCols: Seq[String], r: Int, alpha: Double,
                         salt: String = "bs"): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"confidenceInterval: alpha in (0,1), got $alpha")
    val means = replicateMeans(df, valCol, idCol, groupCols, r, salt)
    val point = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        (sum(col(valCol).cast("double").cast("decimal(38,9)")).cast("double") /
          count(lit(1)).cast("double")).as("point"))
    val m = size(col("__ms")).cast("double")
    val loIdx = (floor(lit(alpha / 2.0) * (m - 1)) + 1).cast("int")
    val hiIdx = (ceil(lit(1.0 - alpha / 2.0) * (m - 1)) + 1).cast("int")
    val cis = means.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("mean"))).as("__ms"))
      .select((groupCols.map(col) :+
        element_at(col("__ms"), loIdx).as("ci_lo") :+
        element_at(col("__ms"), hiIdx).as("ci_hi")): _*)
    point.join(cis, groupCols, "left")
      .select((groupCols.map(col) :+ col("n") :+ col("point") :+
        col("ci_lo") :+ col("ci_hi")): _*)
  }
}
