package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how much it "looks like" a small
  * high-quality target corpus, using hashed n-gram bag-of-words language
  * models, then keep a target-sized importance sample.
  *
  * The model is two multinomials over `buckets` hashed bigram buckets —
  * one fit on the target corpus, one on the raw corpus — both
  * Laplace-smoothed (+1 per bucket, +`buckets` on the total). A
  * document's importance weight is the product over its bigrams of the
  * per-bucket probability ratio `p_target(b) / p_raw(b)`; selection
  * keeps the documents with the largest `log w + Gumbel` keys (Gumbel
  * top-k ≡ sampling without replacement ∝ w).
  *
  * Scale shape (the whole point of the hashed variant): the "model" is
  * ≤ `buckets` rows — fit with ONE map-side-combined aggregate pass over
  * each corpus and then *broadcast*; scoring is a map-side explode +
  * broadcast join + per-doc re-aggregation, i.e. exactly one shuffle of
  * per-doc partials for the 100 TB side and zero corpus-sized joins.
  * Selection avoids a global sort: the cutoff is one approx-quantile
  * pass, then a map-side filter.
  */
object Importance {

  /** Hashed-bigram bucket id for a shingle string. */
  def bucketOf(shingle: Column, buckets: Int): Column =
    pmod(Text.md5HashMod(shingle), lit(buckets.toLong))

  /** `(bucket, cnt)` hashed-bigram counts for a corpus — at most
    * `buckets` rows (model-sized), one aggregate pass.
    */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(Text.bigramShingles(Text.tokens(col(textCol)))).as("__s"))
      .select(bucketOf(col("__s"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket probability-ratio table `(bucket, ratio)` plus the
    * default ratio for buckets unseen in both corpora. With `ct`/`cr`
    * the bucket counts and `Tt`/`Tr` the corpus totals:
    *
    *   ratio(b) = ((ct+1) * (Tr+B)) / ((cr+1) * (Tt+B))
    *
    * computed as `num/den` of two double products, so any engine
    * replaying the same counts gets the bit-identical double. The table
    * is ≤ `buckets` rows and both totals are model-sized scalars — the
    * only driver-side data movement.
    */
  def ratioTable(raw: DataFrame, target: DataFrame, textCol: String,
                 buckets: Int): (DataFrame, Double) = {
    // each corpus is scanned exactly ONCE: the model-sized (≤ buckets
    // rows) count tables are materialized eagerly, so neither the
    // totals pass below nor the ratio join re-runs the corpus aggregate
    // (blocks free with the plan, as Dedup.lshCandidates)
    val ct = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "ct").transform(Materialize.apply)
    val cr = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "cr").transform(Materialize.apply)
    def total(c: DataFrame, cnt: String): Long =
      c.agg(coalesce(sum(col(cnt)), lit(0L))).head().getLong(0)
    val tt = total(ct, "ct") + buckets
    val tr = total(cr, "cr") + buckets
    val joined = ct.join(cr, Seq("bucket"), "full_outer").select(
      col("bucket"),
      ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") * lit(tr.toDouble)
        / ((coalesce(col("cr"), lit(0L)) + 1L).cast("double") * lit(tt.toDouble)))
        .as("ratio"))
    (joined, tr.toDouble / tt.toDouble)
  }

  /** Deterministic per-document ratio statistics — the oracle-exact
    * core: `(idCol, n_grams, ratio_sum)` where `ratio_sum` folds the
    * document's per-bigram probability ratios in ascending value order
    * (a canonical summation order any engine can replay bit-for-bit;
    * plain `sum()` would be partition-order-dependent in doubles).
    * Documents with no bigrams score `(0, 0.0)`.
    *
    * The sorted fold needs the per-doc ratio multiset in one place —
    * the same collect-per-group shape as `fixed-time-window`'s payload,
    * bounded by grams-per-doc. [[logScore]] is the production path
    * (plain partial-aggregated sum of logs, no ordering constraint).
    */
  def ratioSum(raw: DataFrame, target: DataFrame, idCol: String,
               textCol: String, buckets: Int): DataFrame = {
    val (ratios, defaultRatio) = ratioTable(raw, target, textCol, buckets)
    val grams = raw.select(col(idCol),
      explode(Text.bigramShingles(Text.tokens(col(textCol)))).as("__s"))
      .select(col(idCol), bucketOf(col("__s"), buckets).as("bucket"))
    val scored = grams.join(broadcast(ratios), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("ratio"), lit(defaultRatio)).as("ratio"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        aggregate(array_sort(collect_list(col("ratio"))), lit(0.0),
          (acc, x) => acc + x).as("ratio_sum"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("ratio_sum"), lit(0.0)).as("ratio_sum"))
  }

  /** Faithful DSIR log-importance score: `(idCol, n_grams, log_w)` with
    * `log_w = Σ ln ratio(b)` over the document's bigrams. The sum is a
    * plain partial-aggregated `sum()` (addition order free — scores
    * feed a threshold, not a hash gate), so the corpus pays one
    * map-side explode + broadcast join + one shuffle of per-doc
    * partials.
    *
    * This is ALSO a trained multinomial Naive Bayes quality classifier:
    * call it with `target` = a positive corpus (e.g. curated reference
    * text) and `raw` = the candidate pool, and `log_w` is exactly the
    * NB log-likelihood ratio over hashed bigram features — the
    * CCNet/GPT-3-style "looks like quality text" filter, trained by two
    * counting passes instead of gradient steps. Threshold or
    * [[resample]] downstream.
    */
  def logScore(raw: DataFrame, target: DataFrame, idCol: String,
               textCol: String, buckets: Int): DataFrame = {
    val (ratios, defaultRatio) = ratioTable(raw, target, textCol, buckets)
    val logRatios = ratios.select(col("bucket"), log(col("ratio")).as("lw"))
    val grams = raw.select(col(idCol),
      explode(Text.bigramShingles(Text.tokens(col(textCol)))).as("__s"))
      .select(col(idCol), bucketOf(col("__s"), buckets).as("bucket"))
    val scored = grams.join(broadcast(logRatios), Seq("bucket"), "left")
      .select(col(idCol),
        coalesce(col("lw"), lit(math.log(defaultRatio))).as("lw"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lw")).as("log_w"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))
  }

  /** Gumbel-top-k importance resampling over a scored frame: keeps
    * ~`fraction` of rows, preferring high `log w`, with seeded
    * per-document Gumbel noise (`key = log_w + G(hash(seed, id))` —
    * Gumbel top-k is exactly sampling without replacement with
    * probability ∝ w). The cutoff comes from one `percentile_approx`
    * pass instead of a global sort, so selection is two linear passes
    * and a map-side filter — no corpus-wide ordering.
    */
  def resample(scored: DataFrame, idCol: String, logWCol: String,
               fraction: Double, seed: String = "dsir"): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"Importance.resample: fraction must be in (0, 1], got $fraction")
    // uniform from the seeded 60-bit hash, CLAMPED into
    // [1e-12, 1 - 1e-12]: the hash's resolution (2^-60) is finer than a
    // double's ulp near 1.0, so pure offset arithmetic would still
    // round to exactly 1.0 for hashes near the top of the range and
    // make log(-log(u)) NULL — the clamp is the only robust endpoint
    // guard at this precision
    val raw = Text.md5Hash64(concat(lit(seed), lit(":"), col(idCol).cast("string")))
      .cast("double") / lit(math.pow(2.0, 60))
    val u = least(lit(1.0 - 1e-12), greatest(lit(1e-12), raw))
    val keyed = scored.withColumn("__gkey", col(logWCol) - log(-log(u)))
    val cutoffRow = keyed.agg(
      percentile_approx(col("__gkey"), lit(1.0 - fraction), lit(10000))).head()
    if (cutoffRow.isNullAt(0)) keyed.drop("__gkey").limit(0) // empty input
    else keyed.filter(col("__gkey") >= cutoffRow.getDouble(0)).drop("__gkey")
  }
}
