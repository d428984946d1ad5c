package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall measurement for the approximate ANN paths against exact
  * brute-force ground truth on the sf0.01 embeddings fixture — the
  * quality side of the speed/quality trade each index makes. Thresholds
  * are pinned ~10pts under measured values so a silent quality regression
  * (wrong bucket key, broken probe explode, bad cell assignment) fails
  * loudly while fixture-level jitter does not.
  */
class AnnRecallSpec extends AnyFunSuite {
  import TestSpark.spark

  private val K = 10
  private lazy val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = corpus.filter(col("vec_id") % 10 === 0) // 50 of 500
  private lazy val truth = topSets(
    Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K))

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "nn_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Mean fraction of the true top-K recovered, over all queries (a query
    * with no approximate results at all counts as recall 0).
    */
  private def recall(approx: DataFrame): Double = {
    val got = topSets(approx)
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("multi-probe lifts sign-bucket recall monotonically and materially") {
    // Measured on this fixture: bits=4 → 0.126 (single), 0.320 (2 probes),
    // 0.484 (4 probes). Sign-bucketing is the near-dup device (cosine≈1
    // pairs share sign patterns almost surely; general top-10 neighbors
    // often don't — see embedding_near_dup) so absolute top-k recall is
    // modest by design; what this gate pins is that probing least-confident
    // bit flips recovers a large multiple of the single-probe recall.
    val Seq(p0, p2, p4) = Seq(0, 2, 4).map(p =>
      recall(Similarity.bucketedTopK(corpus, queries, "vec_id", "embedding", K,
        bits = 4, extraProbes = p)))
    info(f"sign-bucket bits=4 recall@$K: probes 0 → $p0%.3f, 2 → $p2%.3f, 4 → $p4%.3f")
    assert(p0 <= p2 && p2 <= p4, "extra probes can only widen the candidate set")
    assert(p4 > 2 * p0, "4 probes should recover a large multiple of single-probe recall")
    assert(p4 > 0.3, "regression floor (measured 0.484)")
  }

  test("IVF recall scales with nProbe and beats sign-buckets for top-k") {
    val p1 = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 1))
    val p4 = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 4))
    val p8 = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 8))
    info(f"IVF recall@$K: nProbe=1 $p1%.3f, nProbe=4 $p4%.3f, nProbe=8 $p8%.3f")
    assert(p4 >= p1 && p8 >= p4, "more probed cells can only widen the candidate set")
    assert(p8 > 0.5, "regression floor (measured 0.758)")
  }

  test("IVF centroid training (Lloyd step) is pluggable and sane") {
    val seeded = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 4, trainIters = 0))
    val trained = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 4, trainIters = 1))
    info(f"IVF recall@$K nProbe=4: seed centroids $seeded%.3f, after 1 Lloyd iter $trained%.3f")
    // measured: one Lloyd iteration lifts recall 0.510 → 0.594 here; pin
    // no-regression with a small band (k-means isn't monotone in recall)
    assert(trained > seeded - 0.05, "training must not degrade the index")
    assert(trained > 0.4, "regression floor (measured 0.594)")
  }
}
