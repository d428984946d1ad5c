package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here is a pure map-side predicate/projection over a hash of
  * the row's ID — no shuffle, no RNG state, fuses into the scan — because
  * at 100 TB the properties that matter are:
  *
  *  - *reproducible*: the same (id, salt) always lands in the same
  *    sample/split, across runs, partitionings, cluster sizes, and even
  *    engines ([[Text.md5Hash64]] has a DuckDB mirror, so the oracle
  *    gates these exactly);
  *  - *stable under corpus growth*: adding documents never moves an
  *    existing document between splits (per-row decision, unlike
  *    `ORDER BY rand() LIMIT n` or exact-count reservoirs which reshuffle
  *    everyone when n changes);
  *  - *join-free lineage*: train/val membership can be recomputed from
  *    the id alone — no membership table to store or join at scale.
  *
  * `df.sample()`/`TABLESAMPLE` give none of these (seeded per-partition
  * RNG moves with the partitioning).
  */
object Sampling {

  private[operators] val Buckets = 1000000L

  /** Uniform hash bucket in [0, 1e6) for (salt, id) — the shared device:
    * change `salt` to draw an independent sample.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(Text.md5Hash64(concat_ws(":", lit(salt), id.cast("string"))), lit(Buckets))

  /** Deterministic Bernoulli sample: keeps ~`fraction` of rows, exactly
    * the rows whose hash bucket falls below the threshold.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit((fraction * Buckets).toLong))

  /** Per-stratum deterministic sampling rates (e.g. downsample common
    * languages, keep all rare ones): `fractions` maps stratum value →
    * keep fraction; strata not listed keep `defaultFraction`. The rate
    * lookup compiles to a literal CASE chain — map-side, no join.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double], defaultFraction: Double = 1.0,
                       salt: String = "sample"): DataFrame = {
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold)
  }

  /** Deterministic train/validation/test split: appends a `split` column
    * naming the slice whose cumulative weight range contains the row's
    * hash bucket. Weights are normalized; every row gets exactly one
    * label, and a document keeps its label as the corpus grows.
    */
  def splitByHash(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val b = hashBucket(col(idCol), salt)
    // last slice takes everything remaining, so rounding never drops a row
    val expr = weights.init.zip(cum.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), acc) => when(b < lit((hi * Buckets).toLong), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic EXACTLY-k-per-group sample — "pick k random documents
    * from every source for the eval set": rank rows within each group by
    * their (salted hash, id) and keep rank <= k. Hash-fraction sampling
    * ([[hashSample]]) keeps a PROPORTION (count varies with group size);
    * this keeps a COUNT, the shape eval/holdout construction needs, and
    * the choice is stable as unrelated rows come and go only when a
    * row's own (hash, id) rank moves — same salt, same ids → same
    * sample on every engine.
    *
    * Output: input columns + `sample_rank` (1-based).
    *
    * Scale: one exchange on the group key; the per-group rank is a
    * window sort, parallel ACROSS groups — the group key is the
    * parallelism unit (fine for sources/domains/languages; for k from a
    * SINGLE giant group prefer `orderBy(hash).limit(k)`, a distributed
    * TakeOrdered with no single-task sort).
    */
  def sampleExactK(df: DataFrame, groupCol: String, idCol: String, k: Int,
                   salt: String = "sample"): DataFrame = {
    require(k >= 1, s"sampleExactK: k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Topic-balanced subsampling (cluster cap): assign every embedding to
    * a k-means cell and keep at most `cap` docs per cell by the
    * deterministic salted-hash rank — the embedding-space twin of
    * per-domain caps, stopping one dominant topic / boilerplate family
    * from flooding a training mix (the balance goal behind SemDeDup's
    * within-cluster pruning and DoReMi-style reweighting, as a hard
    * per-cluster quota).
    *
    * Scale: centroids are model-sized (train on a sample here, or pass
    * persisted ones to [[clusterBalancedSampleWith]] — the
    * train-once/apply-many artifact discipline); assignment is a
    * map-side argmax over centroid literals; the cap is ONE exchange on
    * the cell key + a per-cell window, parallel across cells. Output:
    * `(idCol, cell, cosine, sample_rank)`.
    */
  def clusterBalancedSample(emb: DataFrame, idCol: String, vecCol: String,
                            nCells: Int, cap: Int, trainIters: Int = 0,
                            salt: String = "cbal"): DataFrame =
    clusterBalancedSampleWith(emb, idCol, vecCol,
      Similarity.kmeansCentroids(emb, idCol, vecCol, nCells, trainIters), cap, salt)

  /** [[clusterBalancedSample]] against already-trained centroids. */
  def clusterBalancedSampleWith(emb: DataFrame, idCol: String, vecCol: String,
                                cents: Array[(Long, Seq[Float])], cap: Int,
                                salt: String = "cbal"): DataFrame =
    sampleExactK(Similarity.kmeansAssign(emb, idCol, vecCol, cents),
      "cell", idCol, cap, salt)
}
