package graft.operators

import graft.functions.{CountMin, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based corpus statistics: the fixed-memory answers for
  * questions whose exact form needs an unbounded shuffle key space.
  * First member: count-min frequency estimation
  * ([[graft.functions.CountMinAgg]]).
  */
object Sketches {

  /** Build a count-min matrix over the token stream of `textCol`: ONE
    * corpus pass, map-side partial sketches, element-wise merge, and a
    * single model-sized row (depth × width longs) collected to the
    * driver — the same artifact shape as the k-means centroids or the
    * GD weight vector.
    */
  def cmsBuildTokens(docs: DataFrame, textCol: String, depth: Int, width: Int,
                     seed: String): Array[Long] =
    docs.select(explode(Text.tokens(col(textCol))).as("__tok"))
      .agg(CountMin.countMin(col("__tok"), depth, width, seed).as("m"))
      .head.getSeq[Long](0).toArray

  /** Estimated token frequencies: every DISTINCT token with its
    * count-min estimate, heaviest first. The distinct-token frame is the
    * CANDIDATE set (one dedup shuffle of the vocabulary — tokens, not
    * instances); the counting itself is the fixed-memory sketch, so the
    * aggregation state never depends on cardinality. Estimates are
    * deterministic (md5 buckets) and overestimate-only: `est >= true
    * count`, within `2·n/width` with prob `1 − 2^−depth`.
    */
  def cmsTokenCounts(docs: DataFrame, textCol: String, depth: Int, width: Int,
                     seed: String, k: Int): DataFrame = {
    val matrix = cmsBuildTokens(docs, textCol, depth, width, seed)
    docs.select(explode(Text.tokens(col(textCol))).as("token")).distinct()
      .withColumn("est", CountMin.estimate(col("token"), matrix, depth, width, seed))
      .orderBy(col("est").desc, col("token").asc)
      .limit(k)
  }
}
