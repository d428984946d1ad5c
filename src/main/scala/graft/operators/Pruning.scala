package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Example-selection / data-pruning scores for training corpora — the
  * "which examples are worth training on" family:
  *
  *  - EL2N / GraNd difficulty scores (Paul et al., "Deep Learning on a
  *    Data Diet", NeurIPS'21): per-example error-vector norm (and its
  *    gradient-norm scaling) under a trained probe model. Low-score
  *    examples are easy/redundant; high-score ones are hard or
  *    mislabeled. Both are one map-side pass with broadcast weights.
  *  - Prototypicality (Sorscher et al., "Beyond neural scaling laws",
  *    NeurIPS'22): cosine to the assigned cluster centroid. Their
  *    headline result — prune EASY (prototypical) examples when data is
  *    abundant, HARD ones when it is scarce — is the `keepHard` knob of
  *    [[clusterPrune]].
  *  - Greedy k-center coresets (Gonzalez'85; Sener & Savarese,
  *    "Active Learning for CNNs: A Core-Set Approach", ICLR'18): a
  *    k-point subset minimizing (2-approx) the max distance of any
  *    point to its nearest pick — a diversity-first summary of the
  *    corpus.
  *
  * Reference scope note: the reference engine (mirabelle) has no
  * example-selection surface; this family extends the training-data
  * pipeline side, same discipline as `Importance` (DSIR) and `Doremi`.
  */
object Pruning {

  /** Output schema of [[kcenterGreedy]] — the IR validator's
    * artifact-free probe builds from this, never a hand-copied list.
    */
  val KcenterSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pick", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("center_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("radius", org.apache.spark.sql.types.DoubleType, nullable = true)))

  /** EL2N + GraNd difficulty scores for a trained binary logistic probe.
    *
    * For binary logistic with prediction `p` and label `y`, the error
    * L2 norm is `|p - y|` (EL2N) and the last-layer gradient norm is
    * `|p - y| * ||[x, 1]||₂` (GraNd, up to the constant the ranking
    * ignores). `model` is the `(dim, weight)` frame from
    * [[Training.trainLogistic]]; weights collect once (model-sized) and
    * scoring is pure column algebra over the fused
    * [[graft.functions.MarginDot]] kernel — zero shuffle, codegen'd.
    *
    * Output: input row + `el2n`, `grand`. Every float op is the
    * index-order fold / algebraic sigmoid discipline, so scores are
    * bit-reproducible across engines.
    */
  def difficultyScores(df: DataFrame, vecCol: String, labelCol: String,
                       model: DataFrame): DataFrame = {
    val w = model.select(col("dim"), col("weight")).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    difficultyScoresWithWeights(df, vecCol, labelCol, w)
  }

  /** [[difficultyScores]] from a pre-collected weight array — the
    * artifact-path twin (IR `el2n-scores` by `model-path`, cached via
    * [[Training.loadWeightsCached]]).
    */
  def difficultyScoresWithWeights(df: DataFrame, vecCol: String, labelCol: String,
                                  w: Array[Double]): DataFrame = {
    require(w.nonEmpty, "Pruning.difficultyScores: empty model")
    val p = Training.fastSigmoid(VectorExpressions.marginDot(col(vecCol), w))
    val el2n = abs(p - col(labelCol).cast("double"))
    // ||[x,1]||₂ as the same left fold the oracle replays, bias term last
    val normSq = aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x) + lit(1.0)
    df.withColumn("el2n", el2n)
      .withColumn("grand", col("el2n") * sqrt(normSq))
  }

  /** Dataset cartography (Swayamdipta et al., "Dataset Cartography",
    * EMNLP'20): per-example training-dynamics statistics over the
    * probe's per-epoch weight snapshots `trace` (the `(epoch, dim,
    * weight)` frame from [[Training.trainLogisticExactTrace]]):
    *
    *  - `confidence`: mean probability assigned to the GOLD label
    *    across epochs;
    *  - `variability`: population std of that probability;
    *  - `correct_frac`: fraction of epochs the 0.5-threshold prediction
    *    was right;
    *  - `region`: the paper's map quadrants under explicit thresholds —
    *    `easy` (high conf, low var), `hard` (low conf, low var — the
    *    mislabel-candidate corner), else `ambiguous`.
    *
    * The trace collects once (epochs × (dim+1) doubles — model-sized);
    * all statistics are one map-side pass over fixed-epoch-order folds,
    * so the scores are bit-reproducible across engines. Scale: identical
    * to [[difficultyScores]] — embarrassingly parallel scoring under
    * broadcast weights; train the probe on a sample once.
    */
  def cartography(df: DataFrame, vecCol: String, labelCol: String,
                  trace: DataFrame, easyConf: Double = 0.7,
                  hardConf: Double = 0.3, lowVar: Double = 0.2): DataFrame = {
    val byEpoch: Seq[Array[Double]] = trace.select(col("epoch"), col("dim"), col("weight"))
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
    require(byEpoch.nonEmpty, "Pruning.cartography: empty trace")
    require(byEpoch.map(_.length).distinct.size == 1,
      "Pruning.cartography: trace epochs disagree on dim")
    val y = col(labelCol).cast("double")
    val raw: Seq[Column] = byEpoch.map(w =>
      Training.fastSigmoid(VectorExpressions.marginDot(col(vecCol), w)))
    val gold = raw.map(p => when(y === 1.0, p).otherwise(lit(1.0) - p))
    val corr = raw.map(p =>
      when((p >= 0.5) === (y === 1.0), lit(1.0)).otherwise(lit(0.0)))
    val t = lit(byEpoch.size.toDouble)
    val conf = gold.reduceLeft(_ + _) / t
    df.withColumn("confidence", conf)
      .withColumn("variability", sqrt(
        gold.map(g => (g - col("confidence")) * (g - col("confidence")))
          .reduceLeft(_ + _) / t))
      .withColumn("correct_frac", corr.reduceLeft(_ + _) / t)
      .withColumn("region",
        when(col("confidence") >= easyConf && col("variability") <= lowVar, "easy")
          .when(col("confidence") <= hardConf && col("variability") <= lowVar, "hard")
          .otherwise("ambiguous"))
  }

  /** Global difficulty rank (1 = hardest): orders by `scoreCol` DESC
    * (ties to the lower id) and assigns 1-based ranks via the
    * range-exchange + zipWithIndex path — no single-partition window,
    * so the rank survives web-scale row counts.
    */
  def rankBy(df: DataFrame, scoreCol: String, idCol: String,
             rankCol: String = "rank"): DataFrame = {
    val pos = Curation.withGlobalPositionAs(
      df, Seq(col(scoreCol).desc, col(idCol).asc), "__pos")
    pos.withColumn(rankCol, (col("__pos") + 1L)).drop("__pos")
  }

  /** Prototypicality under trained centroids: `(idCol, cell, cosine)`
    * where `cosine` is similarity to the ASSIGNED (argmax) centroid —
    * one map-side argmax over centroid literals (shared with
    * [[Similarity.kmeansAssign]]), no shuffle. High cosine = the
    * cluster's prototype; low = an outlier within its cluster.
    */
  def prototypicality(df: DataFrame, idCol: String, vecCol: String,
                      cents: Array[(Long, Seq[Float])]): DataFrame =
    Similarity.kmeansAssign(df, idCol, vecCol, cents)

  /** Within-cluster prototypicality rank (1 = most prototypical, ties to
    * the lower id). The `row_number <= n` filter consumers apply
    * compiles to Spark's `WindowGroupLimit` (map-side per-partition
    * top-n before the cell exchange), so a handful of corpus-scale
    * cells never materialize fully sorted.
    */
  def prototypeRanks(df: DataFrame, idCol: String, vecCol: String,
                     cents: Array[(Long, Seq[Float])]): DataFrame = {
    val assigned = prototypicality(df, idCol, vecCol, cents)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    assigned.withColumn("proto_rank", row_number().over(w))
  }

  /** Cluster-balanced pruning: keep `perCluster` examples per centroid
    * cell. `keepHard = false` keeps the MOST prototypical (scarce-data
    * regime; also the self-supervised-prototypes dedup shape);
    * `keepHard = true` keeps the LEAST prototypical (abundant-data
    * regime — Sorscher et al.'s main result). Deterministic: ties to
    * the lower id. One exchange on `cell` with the group-limit pushed
    * map-side.
    */
  def clusterPrune(df: DataFrame, idCol: String, vecCol: String,
                   cents: Array[(Long, Seq[Float])], perCluster: Int,
                   keepHard: Boolean = false): DataFrame = {
    require(perCluster >= 1, s"Pruning.clusterPrune: perCluster must be >= 1, got $perCluster")
    val assigned = prototypicality(df, idCol, vecCol, cents)
    val ord = if (keepHard) col("cosine").asc else col("cosine").desc
    val w = Window.partitionBy(col("cell")).orderBy(ord, col(idCol).asc)
    assigned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perCluster)
      .drop("__rn")
  }

  /** Greedy k-center coreset over cosine distance `1 - cos(a, b)`
    * (Gonzalez's 2-approximation to the k-center objective). Returns
    * the model-sized selection table `(pick, center_id, radius)`:
    * `pick` is 1-based selection order, `radius` is the max-min
    * distance the pick closed (the coreset covering radius after
    * `pick - 1` centers; NULL for the seed pick).
    *
    * Deterministic: the seed is the lowest distinct id (the
    * [[Similarity.kmeansCentroids]] seeding discipline) and every
    * argmax breaks ties to the lower id.
    *
    * Scale: the running min-distance state `(id, vec, mind)` is
    * materialized once per round and updated INCREMENTALLY against the
    * single new center (broadcast literal — one fused-cosine map pass +
    * a `TakeOrdered(1)` argmax per round), so the k-round loop costs
    * O(n·k) distance evaluations total, not O(n·k²), and only k
    * model-sized rows ever reach the driver. Pair with
    * [[Similarity.kmeansAssign]] on the picked centers to partition the
    * corpus by coreset cell.
    */
  def kcenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"Pruning.kcenterGreedy: k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .dropDuplicates("__id")
    val first = base.orderBy(col("__id")).limit(1).collect()
    require(first.nonEmpty, "Pruning.kcenterGreedy: empty corpus")
    def dist(center: Seq[Float]): Column =
      lit(1.0) - VectorExpressions.cosineF(col("__v"), typedLit(center))
    val picks = scala.collection.mutable.ArrayBuffer(
      (1, first(0).getLong(0), Option.empty[Double]))
    var state = Materialize(
      base.withColumn("__mind", dist(first(0).getSeq[Float](1))))
    for (t <- 2 to k) {
      // unconditional argmax (ties to the lower id) — the same step the
      // unrolled oracle replays; a corpus with fewer than k DISTINCT
      // locations re-covers duplicates rather than failing
      val far = state.orderBy(col("__mind").desc, col("__id").asc).limit(1).collect()(0)
      picks += ((t, far.getLong(0), Some(far.getDouble(2))))
      state = Materialize(state.withColumn("__mind",
        least(col("__mind"), dist(far.getSeq[Float](1)))))
    }
    picks.toSeq.map { case (p, id, r) => (p, id, r) }
      .toDF("pick", "center_id", "radius")
  }
}
