package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions

/** Typed aggregation plugin pairs (SURVEY §2.9).
  *
  * The reference's window aggregations are pluggable
  * accumulate/finalize function pairs (`keyword->aggr-fn`,
  * `/root/reference/src/clojure/mirabelle/action.clj:2285-2374`):
  * `accumulate` folds an event into state, `finalize` turns state into
  * the emitted value. Spark's typed `Aggregator[IN, BUF, OUT]` is exactly
  * that split — `reduce`/`merge` are the (partial-aggregation-aware)
  * accumulate, `finish` is finalize — and `functions.udaf` lifts one
  * into a `Column` usable in any `agg(...)`, including
  * `Windows.customWindow` and the IR's `aggr-custom` action. Partial
  * aggregation (map-side combine) comes for free from `merge`, which the
  * reference's single-node pairs never needed.
  */
object Aggregators {

  /** Weighted mean: accumulate `(Σ w·x, Σ w)`, finalize the quotient —
    * the same state shape as the reference's `mean` pair
    * (`action.clj:2312-2320` accumulate, `:2371-2374` finalize), with a
    * weight input added to make the example non-trivial. Empty/zero
    * weight yields NaN (division semantics, SURVEY §7.4.5).
    */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `weightedMean(metric, weight)` as an aggregation Column factory. */
  val weightedMean: UserDefinedFunction = functions.udaf(new WeightedMean)
}
