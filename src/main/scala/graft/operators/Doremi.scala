package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "Doremi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): given a
  * per-document loss and a reference loss, compute per-domain clipped
  * EXCESS loss, run the multiplicative-weights (exponentiated-gradient)
  * update over the domain simplex, and resample the corpus to the
  * learned mixture — the loss-aware sibling of
  * [[Curation.temperatureMix]]'s count-only rebalancing.
  *
  * Scope note: full DoReMi retrains a proxy model between rounds; that
  * training loop lives outside the data plane. This operator takes the
  * losses as given columns (e.g. [[NgramLm.score]]'s perplexity or
  * [[Training]]'s classifier margin) and runs the mixture optimization —
  * the part a 100 TB curation pipeline executes.
  *
  * Scale shape: per-domain stats are ONE map-side-combined aggregate
  * (the loss sum runs in `DECIMAL(38,12)`, so it is EXACT and
  * order/partition invariant — no sorted-fold `collect_list`, which
  * would materialize a domain per row); the MW loop is driver math over
  * the model-sized domain table (like the GD loop's weight collect);
  * the resample is [[Curation.upsampleByWeight]]'s map-side copy rule.
  * Nothing shuffles the corpus beyond the one stats aggregate.
  *
  * Determinism: excess is exact decimal arithmetic; the MW loop's first
  * round is exp-then-normalize from the flat prior in domain-ascending
  * fold order, so at `rounds = 1, smoothing = 0` the oracle replays it
  * operation-for-operation; `exp` differences (JVM StrictMath vs libm,
  * ~1 ULP on rare inputs) are absorbed by the repo's
  * DECIMAL(38,6)-then-DOUBLE readout convention on the weight column.
  */
object Doremi {

  /** Per-domain stats: row count and the EXACT decimal sum of
    * `loss - refLoss`, read out as (domain, n, excess) with
    * `excess = max(sum / n, 0)` — DoReMi's clipped excess loss.
    * One map-side-combined aggregate; decimal summation makes the
    * result independent of partitioning.
    */
  def domainExcess(df: DataFrame, domainCol: String,
                   loss: Column, refLoss: Column): DataFrame =
    df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n"),
        sum((loss - refLoss).cast("decimal(38,12)")).as("__sl"))
      .select(col("domain"), col("n"),
        greatest(col("__sl").cast("double") / col("n"), lit(0.0)).as("excess"))

  /** The learned mixture: `rounds` multiplicative-weights updates from a
    * uniform prior over the domains, averaged over iterates (DoReMi's
    * `ᾱ`), with optional uniform smoothing `(1-s)·α + s/D` per round.
    * Output: (domain, n, excess, weight), weight through the
    * DECIMAL(38,6)→DOUBLE readout convention, summing to ~1.
    */
  def weights(df: DataFrame, domainCol: String, loss: Column, refLoss: Column,
              eta: Double = 1.0, rounds: Int = 1,
              smoothing: Double = 0.0): DataFrame = {
    require(eta > 0, s"doremi: eta must be > 0, got $eta")
    require(rounds >= 1, s"doremi: rounds must be >= 1, got $rounds")
    require(smoothing >= 0 && smoothing < 1,
      s"doremi: smoothing must be in [0, 1), got $smoothing")
    val spark = df.sparkSession
    import spark.implicits._
    val stats = domainExcess(df, domainCol, loss, refLoss)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    require(stats.nonEmpty, "doremi: empty input")
    val d = stats.length
    val excess = stats.map(_._3)
    // round 1 runs exp-then-normalize from the flat prior — bit-identical
    // to the oracle's replay; later rounds iterate on the normalized alpha
    var u = Array.fill(d)(1.0)
    val avg = Array.fill(d)(0.0)
    var t = 0
    while (t < rounds) {
      var i = 0
      while (i < d) { u(i) = u(i) * StrictMath.exp(eta * excess(i)); i += 1 }
      var z = 0.0
      i = 0
      while (i < d) { z = z + u(i); i += 1 } // domain-ascending fold
      val alpha = u.map(_ / z)
      if (smoothing > 0) {
        i = 0
        while (i < d) { alpha(i) = (1 - smoothing) * alpha(i) + smoothing / d; i += 1 }
      }
      i = 0
      while (i < d) { avg(i) = avg(i) + alpha(i); i += 1 }
      // normalized iterate feeds the next round (same fixed point,
      // no overflow at large rounds*eta*excess; round 1 — the oracle's
      // round — reads alpha before this reassignment)
      u = alpha.clone()
      t += 1
    }
    stats.zipWithIndex.map { case ((dom, n, e), i) => (dom, n, e, avg(i) / rounds) }
      .toSeq.toDF("domain", "n", "excess", "weight")
      .select(col("domain"), col("n"), col("excess"),
        col("weight").cast("decimal(38,6)").cast("double").as("weight"))
  }

  /** Resample the corpus to the learned mixture: domain `d` gets
    * sampling mass `weight_d`, i.e. a per-row copy rate of
    * `total * weight_d / n_d` through [[Curation.upsampleByWeight]]'s
    * map-side rule (output size ≈ input size, like temperatureMix).
    */
  def reweight(df: DataFrame, domainCol: String, idCol: String,
               loss: Column, refLoss: Column,
               eta: Double = 1.0, rounds: Int = 1, smoothing: Double = 0.0,
               salt: String = "doremi"): DataFrame = {
    val w = weights(df, domainCol, loss, refLoss, eta, rounds, smoothing)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    val total = w.map(_._2).sum
    val rates = w.map { case (dom, n, wt) =>
      dom -> total.toDouble * wt / n.toDouble
    }.toMap
    Curation.upsampleByWeight(df, domainCol, idCol, rates,
      defaultWeight = 0.0, salt = salt)
  }
}
