package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model training and perplexity scoring —
  * the CCNet-style quality filter (Wenzek et al. 2020: score every
  * document with an n-gram LM, bucket the corpus into head/middle/tail
  * by perplexity, train on the head). The same primitive powers
  * KenLM-based filtering in most public web-corpus pipelines.
  *
  * Model: order-`n` LM with add-α (Lidstone) smoothing over an explicit
  * vocabulary:
  *
  * {{{  p(w | ctx) = (c(ctx, w) + α) / (c(ctx) + α·V)  }}}
  *
  * where `ctx` is the space-joined previous `n-1` tokens, documents are
  * padded with `n-1` BOS markers and one EOS, and `V` counts distinct
  * corpus tokens plus EOS (so the unseen-context distribution is the
  * uniform `1/V`). Add-α is the transparent, exactly-reproducible member
  * of the smoothing family — a production filter may prefer Kneser-Ney,
  * but the pipeline shape (and the bucketing that consumes the scores)
  * is identical.
  *
  * Scale shape — why this runs at 100 TB:
  *  - '''train''' touches the corpus with ONE explode + ONE `groupBy`
  *    (map-side combined integer counts); the result is model-sized
  *    (distinct n-grams, Zipf-bounded far below corpus bytes). Context
  *    totals derive from the n-gram table, not another corpus pass.
  *  - '''score''' is one explode + two equi-joins against the model
  *    (on `(ctx, word)` for the n-gram count, on `ctx` for the context
  *    total) + one per-document aggregation. Spark broadcasts the model
  *    when it fits (the bench path); at web scale both joins are plain
  *    shuffle hash joins on uniform keys — never all-pairs.
  *  - '''bucket''' avoids a single-partition global window: cutoff is by
  *    global rank from a range-exchange sort + `zipWithIndex` (the
  *    [[Curation.shuffleOrder]] pattern).
  *
  * Determinism: counts are integer sums; per-token `ln p` uses Spark's
  * builtin `log` (codegen = `StrictMath.log` — bit-reproducible on EVERY
  * JVM and platform, the right property for a distributed engine);
  * per-document sums fold in token order via the sorted-fold convention.
  * Cross-ENGINE (DuckDB libm) the transcendentals differ by 1 ULP on
  * ~0.1% of inputs (measured), so oracle comparison happens at
  * `DECIMAL(38,6)` like the repo's other double-sum gates.
  */
object NgramLm {

  val Bos = "<s>"
  val Eos = "</s>"

  /** Output schema of [[trainCounts]] — source of truth for the IR
    * validator's `ngram-train` stub.
    */
  val CountsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ctx", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, nullable = false)))

  /** Padded token array for an order-`n` model: `n-1` BOS + tokens + EOS. */
  private def padded(text: Column, n: Int): Column = {
    val toks = Text.tokens(text)
    if (n <= 1) concat(toks, array(lit(Eos)))
    else concat(array(Seq.fill(n - 1)(lit(Bos)): _*), toks, array(lit(Eos)))
  }

  /** One row per scoring position: `(pos, ctx, word)` — `pos` is the
    * 1-based index of `word` in the padded array, `ctx` the space-joined
    * `n-1` tokens before it ('' for unigrams).
    *
    * The lambda indexes back into `toksCol` per element, so callers
    * MUST pass a materialized column (an attribute is free to re-read),
    * never an expression like `padded(col(text), n)` — an expression is
    * re-EVALUATED per element inside the lambda, re-tokenizing the
    * document once per position (the lambda-boundary O(tokens²) class;
    * see [[graft.functions.Quality.ngrams]]'s scaladoc). Use
    * [[positionsTable]], which stages the padded array behind the
    * explode so the optimizer cannot inline it back.
    */
  private def positions(toksCol: Column, n: Int): Column =
    transform(sequence(lit(n), size(toksCol)), i =>
      struct(i.as("pos"),
        array_join(slice(toksCol, i - lit(n - 1), lit(n - 1)), " ").as("ctx"),
        element_at(toksCol, i).as("word")))

  /** Exploded scoring positions `(["__id"], pos, ctx, word)` with the
    * padded token array materialized as a real column FIRST: the
    * `Generate` (explode) boundary between the two projections is one
    * `CollapseProject` does not cross, so [[positions]]' lambda indexes
    * an attribute, not the tokenization expression.
    */
  private def positionsTable(docs: DataFrame, textCol: String, n: Int,
                             idCol: Option[String]): DataFrame = {
    val id = idCol.map(ic => col(ic).as("__id")).toSeq
    val g = docs.select(id :+ padded(col(textCol), n).as("__toks"): _*)
      .select(idCol.map(_ => col("__id")).toSeq :+
        explode(positions(col("__toks"), n)).as("g"): _*)
    g.select(idCol.map(_ => col("__id")).toSeq ++ Seq(
      col("g.pos").as("pos"), col("g.ctx").as("ctx"), col("g.word").as("word")): _*)
  }

  /** N-gram count table `(ctx, word, cnt)` — the model's bulk. One
    * corpus explode, one map-side-combined count.
    */
  def trainCounts(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"NgramLm: order must be >= 1, got $n")
    positionsTable(docs, textCol, n, None)
      .groupBy(col("ctx"), col("word"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Context totals `(ctx, ctx_cnt)` derived from the count table —
    * model-sized input, no second corpus pass.
    */
  def contextTotals(counts: DataFrame): DataFrame =
    counts.groupBy("ctx").agg(sum("cnt").as("ctx_cnt"))

  /** Vocabulary size V = distinct corpus tokens + EOS (BOS never appears
    * in word position, so it is deliberately NOT counted).
    */
  def vocabSize(docs: DataFrame, textCol: String): Long =
    docs.select(explode(Text.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0) + 1L

  /** [[vocabSize]] derived from an (ideally materialized) count table
    * instead of a second full corpus tokenize pass: [[padded]] puts
    * `n−1` BOS markers in front, so word position covers EVERY corpus
    * token, and EOS appears in word position exactly once per non-null
    * doc — `countDistinct(word)` IS `|distinct tokens| + 1`. The floor
    * keeps the corpus-pass value (1) on an empty/all-null corpus, where
    * the count table has no rows. Value-identical to [[vocabSize]] for
    * the same corpus/order (r16, guide §2.4 — the n-gram gates paid a
    * redundant corpus pass per model build).
    */
  def vocabSizeFromCounts(counts: DataFrame): Long =
    math.max(counts.agg(countDistinct(col("word"))).head.getLong(0), 1L)

  /** Full training run → persisted model directory (`ngrams.parquet` +
    * single-row `meta.parquet` with n/alpha/vocab_size). The artifact is
    * what production pipelines reuse: train once on a reference corpus
    * (CCNet: Wikipedia), score everything else against it.
    */
  def train(docs: DataFrame, textCol: String, n: Int, alpha: Double,
            path: String): Unit = {
    require(alpha > 0, s"NgramLm: alpha must be > 0, got $alpha")
    val counts = trainCounts(docs, textCol, n)
    counts.write.mode("overwrite").parquet(s"$path/ngrams.parquet")
    val spark = docs.sparkSession
    import spark.implicits._
    // V off the just-written count table's word column — not a second
    // corpus tokenize pass (vocabSizeFromCounts scaladoc)
    Seq((n, alpha, vocabSizeFromCounts(spark.read.parquet(s"$path/ngrams.parquet"))))
      .toDF("n", "alpha", "vocab_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta.parquet")
  }

  final case class Model(counts: DataFrame, n: Int, alpha: Double, vocabSize: Long)

  def loadModel(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta.parquet").head
    Model(spark.read.parquet(s"$path/ngrams.parquet"),
      meta.getAs[Int]("n"), meta.getAs[Double]("alpha"),
      meta.getAs[Long]("vocab_size"))
  }

  /** Score every document: output = input columns +
    * `n_scored` (tokens + EOS), `logprob` (Σ ln p, token order),
    * `cross_entropy` (−logprob / n_scored) and `ppl` (e^cross_entropy).
    * Lower ppl = more like the training corpus.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
            model: Model): DataFrame = {
    val counts = model.counts
    val ctxTot = contextTotals(counts)
    val n = model.n
    val exploded = positionsTable(docs, textCol, n, Some(idCol))
    val joined = exploded
      .join(counts.withColumnRenamed("cnt", "__cnt"), Seq("ctx", "word"), "left")
      .join(ctxTot.withColumnRenamed("ctx_cnt", "__ctx_cnt"), Seq("ctx"), "left")
      .withColumn("__lnp", log(
        (coalesce(col("__cnt"), lit(0L)).cast("double") + lit(model.alpha)) /
          (coalesce(col("__ctx_cnt"), lit(0L)).cast("double") +
            lit(model.alpha) * lit(model.vocabSize.toDouble))))
    foldPerDoc(docs, joined, idCol)
  }

  /** Shared scoring tail: token-order `ln p` fold (bitwise-reproducible
    * double sum on any engine) + the ce/ppl derivations, joined back to
    * the input rows. `joined` must carry `(__id, pos, __lnp)`.
    */
  private def foldPerDoc(docs: DataFrame, joined: DataFrame,
                         idCol: String): DataFrame = {
    val perDoc = joined.groupBy("__id")
      .agg(count(lit(1)).as("n_scored"),
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("__lnp")))),
          lit(0.0), (acc, x) => acc + x.getField("__lnp")).as("logprob"))
      .withColumn("cross_entropy", -col("logprob") / col("n_scored").cast("double"))
      .withColumn("ppl", exp(col("cross_entropy")))
    docs.join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "inner")
  }

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney 1995 / the
    * Chen-Goodman interpolated form — what CCNet's KenLM actually
    * smooths with, vs the transparent add-α above):
    *
    * {{{ p(w|c) = max(cnt(c,w) − d, 0)/cnt(c) + d·N1+(c,·)/cnt(c) · Pcont(w) }}}
    *
    * with the continuation probability over distinct-predecessor counts,
    * add-one smoothed so every word (and the unseen-word case) stays
    * strictly positive — the deterministic totality variant, documented:
    *
    * {{{ Pcont(w) = (N1+(·,w) + 1) / (N1+(·,·) + V) }}}
    *
    * Unseen contexts back off entirely to `Pcont`. Everything derives
    * from the ONE bigram count table ([[trainCounts]], one corpus pass):
    * per-context totals/follower counts and per-word predecessor counts
    * are model-sized aggregations of it, and `N1+(·,·)` is its row
    * count. Scoring joins are the [[score]] shape plus one more
    * model-sized join on `word`.
    */
  final case class KnModel(counts: DataFrame, discount: Double, vocabSize: Long)

  def trainKneserNey(docs: DataFrame, textCol: String,
                     discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1,
      s"NgramLm: KN discount must be in (0,1), got $discount")
    val counts = Materialize(trainCounts(docs, textCol, 2))
    // V from the materialized counts — not a second corpus pass
    KnModel(counts, discount, vocabSizeFromCounts(counts))
  }

  /** Persist / reload the KN artifact (same layout discipline as
    * [[train]]). */
  def saveKneserNey(model: KnModel, path: String): Unit = {
    model.counts.write.mode("overwrite").parquet(s"$path/ngrams.parquet")
    val spark = model.counts.sparkSession
    import spark.implicits._
    Seq((model.discount, model.vocabSize)).toDF("discount", "vocab_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta.parquet")
  }

  def loadKneserNey(spark: SparkSession, path: String): KnModel = {
    val meta = spark.read.parquet(s"$path/meta.parquet").head
    KnModel(spark.read.parquet(s"$path/ngrams.parquet"),
      meta.getAs[Double]("discount"), meta.getAs[Long]("vocab_size"))
  }

  /** Stupid backoff (Brants et al. 2007 — the deliberately unnormalized
    * score Google used at web scale because it needs NO discount
    * statistics and parallelizes trivially):
    *
    * {{{ S(w|c) = cnt(c,w)/cnt(c) if seen, else β · S(w) }}}
    *
    * with `S(w) = (cnt(w)+1)/(N+V)` — the add-one unigram keeps unseen
    * words finite (documented totality variant). Unseen contexts back
    * off the same way. Output mirrors [[score]] (`ppl` is then the
    * exp-mean of −ln S — a comparable filtering signal, not a true
    * perplexity, per the paper). Every table derives from the SAME
    * bigram count table: unigram counts are its per-word sums, `N` its
    * total mass.
    */
  def scoreStupidBackoff(docs: DataFrame, textCol: String, idCol: String,
                         counts: DataFrame, vocabSize: Long,
                         beta: Double = 0.4): DataFrame = {
    require(beta > 0 && beta <= 1,
      s"NgramLm: stupid-backoff beta must be in (0,1], got $beta")
    val bi = counts
    val ctxTot = contextTotals(bi)
    val uni = bi.groupBy("word").agg(sum("cnt").as("__cw"))
    val nTotal = bi.agg(sum("cnt")).head.getLong(0)
    val denom = (nTotal + vocabSize).toDouble
    val exploded = positionsTable(docs, textCol, 2, Some(idCol))
    val joined = exploded
      .join(bi.withColumnRenamed("cnt", "__c"), Seq("ctx", "word"), "left")
      .join(ctxTot.withColumnRenamed("ctx_cnt", "__t"), Seq("ctx"), "left")
      .join(uni, Seq("word"), "left")
    val sw = lit(beta) *
      ((coalesce(col("__cw"), lit(0L)).cast("double") + lit(1.0)) / lit(denom))
    val s = when(col("__c").isNotNull,
        col("__c").cast("double") / col("__t").cast("double"))
      .otherwise(sw)
    foldPerDoc(docs, joined.withColumn("__lnp", log(s)), idCol)
  }

  /** Score documents under an interpolated-KN bigram — same output
    * columns as [[score]]. */
  def scoreKneserNey(docs: DataFrame, textCol: String, idCol: String,
                     model: KnModel): DataFrame = {
    val bi = model.counts
    val ctxAgg = bi.groupBy("ctx")
      .agg(sum("cnt").as("__t"), count(lit(1)).as("__n1"))
    val contAgg = bi.groupBy("word").agg(count(lit(1)).as("__nw"))
    // N1+(·,·) + V: one scalar, computed once driver-side (model-sized
    // action, same class as [[vocabSize]])
    val contDenom = (bi.count() + model.vocabSize).toDouble
    val d = lit(model.discount)
    val exploded = positionsTable(docs, textCol, 2, Some(idCol))
    val joined = exploded
      .join(bi.withColumnRenamed("cnt", "__c"), Seq("ctx", "word"), "left")
      .join(ctxAgg, Seq("ctx"), "left")
      .join(contAgg, Seq("word"), "left")
    val pcont = (coalesce(col("__nw"), lit(0L)).cast("double") + lit(1.0)) /
      lit(contDenom)
    val p = when(col("__t").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("__c"), lit(0L)).cast("double") - d, lit(0.0)) /
          col("__t").cast("double") +
          d * col("__n1").cast("double") / col("__t").cast("double") * pcont)
    foldPerDoc(docs, joined.withColumn("__lnp", log(p)), idCol)
  }

  /** CCNet head/middle/tail bucketing: rank documents by perplexity
    * ascending (ties by id) and cut the ranking into `buckets.length`
    * equal spans — bucket 0 ("head") = the most-fluent third. Global
    * rank comes from a range-exchange sort + `zipWithIndex`, never a
    * single-partition window.
    *
    * Output: input columns + `ppl_rank` (0-based) + `ppl_bucket`.
    */
  def pplBucket(scored: DataFrame, idCol: String, pplCol: String,
                buckets: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    require(buckets.nonEmpty, "NgramLm.pplBucket: need at least one bucket")
    // The scoring pipeline behind `scored` (corpus explode + two model
    // joins + per-doc fold) is consumed THREE times here: the count()
    // action plus zipWithIndex's two passes (partition sizing + output).
    // Materialize once — at 100 TB a triple corpus-scoring pass is the
    // dominant cost of the whole bucketing.
    val s = Materialize(scored)
    val total = s.count()
    val ranked = Curation.withGlobalPositionAs(
      s, Seq(col(pplCol).asc, col(idCol).asc), "ppl_rank")
    val k = buckets.length
    // bucket b gets ranks [b*total/k, (b+1)*total/k) — integer math,
    // byte-identical to the oracle's rank arithmetic
    val bucketIdx = when(lit(total) === 0, lit(0))
      .otherwise(least(floor(col("ppl_rank") * k / lit(total)), lit(k - 1)))
    val names = map(buckets.zipWithIndex.flatMap {
      case (name, i) => Seq(lit(i.toLong), lit(name))
    }: _*)
    ranked.withColumn("ppl_bucket", element_at(names, bucketIdx.cast("long")))
  }
}
