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

  test("PQ (ADC) recall grows with codebook size; regression floor") {
    val r16 = recall(Similarity.pqTopK(corpus, queries, "vec_id", "embedding", K,
      m = 4, codes = 16))
    val r64 = recall(Similarity.pqTopK(corpus, queries, "vec_id", "embedding", K,
      m = 4, codes = 64))
    info(f"PQ m=4 recall@$K: codes=16 $r16%.3f, codes=64 $r64%.3f")
    // This fixture is near-uniform random, the hardest case for
    // quantization (no cluster structure for a 16-entry seed codebook to
    // exploit) — measured 0.160 / 0.306. What the gate pins: recall is a
    // REAL signal (way above the 10/499 ≈ 0.02 random baseline), and a
    // bigger codebook buys quality, the defining PQ trade.
    assert(r16 > 0.08, "regression floor (measured 0.160)")
    assert(r64 > r16, "larger codebook must not lose recall on this fixture")
  }

  test("bucketed near-dup pair recall vs the all-pairs oracle (the LSH trade, measured)") {
    import graft.operators.Dedup
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // The dedup claim behind embeddingNearDupBucketed (Dedup.scala): vectors
    // at cosine ≈ 1 share the leading-dimension sign pattern almost surely.
    // The fixture has no natural high-cosine pairs (random vectors cluster
    // near cosine 0), so PLANT them: a deterministic additive perturbation
    // of every corpus vector (copy id = vec_id + 10000) keeps cosine > 0.95
    // but can flip the sign of near-zero coordinates — exactly the boundary
    // the LSH trades away.
    val perturbed = corpus.select(
      (col("vec_id") + 10000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> cast(x + 0.08 * sin(vec_id * 64 + i) as float))")
        .as("embedding"))
    val planted = corpus.select("vec_id", "embedding").union(perturbed)
    val exact = pairs(Dedup.embeddingNearDup(planted, "vec_id", "embedding", 0.9))
      .filter { case (a, b) => b == a + 10000 } // the planted twin pairs
    def recallAt(probes: Int): Double = {
      val b = pairs(Dedup.embeddingNearDupBucketed(
        planted, "vec_id", "embedding", 0.9, bits = 4, extraProbes = probes))
      exact.count(b.contains).toDouble / exact.size
    }
    val Seq(r0, r1, r2) = Seq(0, 1, 2).map(recallAt)
    info(f"planted-pair recall at cosine>0.9, bits=4: probes 0 → $r0%.3f, 1 → $r1%.3f, 2 → $r2%.3f")
    assert(exact.size > 400, "perturbation must keep nearly all twins above the threshold")
    assert(r0 > 0.35, "regression floor: a broken bucket key collapses this to ~0")
    assert(r0 <= r1 && r1 <= r2, "extra probes can only widen the candidate set")
    assert(r2 > r0 + 0.15, "probing the least-confident bit flips must recover boundary pairs")

    // And the documented cost at a LOW threshold: cosine-0.3 "near" pairs
    // rarely share sign patterns, so recall there is poor — pinned as the
    // boundary of the device, not a defect (use the all-pairs escape hatch
    // or more probes when low-threshold completeness matters).
    val exactLow = pairs(Dedup.embeddingNearDup(corpus, "vec_id", "embedding", 0.3))
    val bucketedLow = pairs(
      Dedup.embeddingNearDupBucketed(corpus, "vec_id", "embedding", 0.3, bits = 4))
    assert(bucketedLow.subsetOf(exactLow), "bucketing may drop pairs, never invent them")
    val recallLow = bucketedLow.size.toDouble / exactLow.size
    info(f"pair recall at cosine>0.3, bits=4: $recallLow%.3f (${bucketedLow.size}/${exactLow.size})")
    assert(recallLow > 0.08, "sanity floor (measured 0.136)")
  }

  test("SQ8 quantized scan + exact re-rank: near-exact recall, monotone in rerank") {
    val rK = recall(Similarity.sq8TopK(corpus, queries, "vec_id", "embedding", K,
      rerank = K))
    val r3K = recall(Similarity.sq8TopK(corpus, queries, "vec_id", "embedding", K,
      rerank = 3 * K))
    info(f"SQ8 recall@$K: rerank=$K $rK%.3f, rerank=${3 * K} $r3K%.3f")
    // int8 keeps ~7 bits/coordinate — the approximate ranking is already
    // near-exact, and a 3x re-rank margin recovers boundary swaps
    assert(r3K >= rK, "a wider re-rank pool can only improve recall")
    assert(rK > 0.9, "regression floor: int8 scan alone should be near-exact")
    assert(r3K > 0.97, "regression floor: re-rank margin recovers boundary swaps")
  }

  test("IVF-PQ: composed index recall tracks its IVF candidate ceiling") {
    // IVF-PQ can never beat IVF at the same nProbe (same candidate set,
    // quantized scoring); what it buys is scanning m bytes per candidate
    // instead of the vector. Pin: a real signal well above random, within
    // a quantization-loss margin of the IVF ceiling, monotone in nProbe.
    val ivf4 = recall(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 4))
    val pq4 = recall(Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 4, m = 4, codes = 16))
    val pq8 = recall(Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding", K,
      nCells = 16, nProbe = 8, m = 4, codes = 16))
    info(f"IVF-PQ recall@$K: nProbe=4 $pq4%.3f (IVF ceiling $ivf4%.3f), nProbe=8 $pq8%.3f")
    assert(pq4 <= ivf4 + 0.02, "quantized scoring cannot beat exact scoring of the same candidates")
    assert(pq8 >= pq4 - 0.05, "more probed cells must not collapse recall")
    assert(pq4 > 0.05, "regression floor: must be a real signal above the ~0.02 random baseline")
  }

  test("centroid save/load round-trip: identical assignment from the loaded model") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cents").toString + "/model"
    val trained = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 16, 1)
    Similarity.saveCentroids(trained, dir, spark)
    val loaded = Similarity.loadCentroids(spark, dir)
    assert(loaded.toSeq == trained.toSeq)
    val a = Similarity.kmeansAssign(corpus, "vec_id", "embedding", trained)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.kmeansAssign(corpus, "vec_id", "embedding", loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("kmeans: a Lloyd iteration lifts the mean assigned cosine materially") {
    def meanCos(iters: Int): Double = {
      val c = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 16, iters)
      Similarity.kmeansAssign(corpus, "vec_id", "embedding", c)
        .agg(avg(col("cosine"))).head().getDouble(0)
    }
    val (m0, m1) = (meanCos(0), meanCos(1))
    info(f"mean assigned cosine: seeds $m0%.3f, after 1 Lloyd iter $m1%.3f")
    // arbitrary low-id seeds → per-cell means: on this fixture the
    // objective jumps (measured well above +0.05); pin a real lift
    assert(m1 > m0 + 0.02, s"training must tighten clusters: $m0 -> $m1")
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

  test("persisted IVF-PQ index: query == in-one-go operator bit-for-bit; codes pruned by cell") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_spec").toString
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", tmp,
      nCells = 16, m = 4, codes = 16)
    // cell-partitioned layout on disk
    val cellDirs = new java.io.File(s"$tmp/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.nonEmpty, "codes must be written partitioned by cell")
    val direct = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      K, nCells = 16, nProbe = 4, m = 4, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val fromIdx = Similarity.queryIvfPqIndex(spark, tmp, queries,
      "vec_id", "embedding", K, nProbe = 4)
    assert(fromIdx.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet == direct,
      "stored-index query must reproduce the operator exactly, scores included")
    // a single query probes nProbe cells: the scan is pruned to those
    // partitions (visible in the physical plan's partition filters)
    val one = Similarity.queryIvfPqIndex(spark, tmp,
      queries.limit(1), "vec_id", "embedding", K, nProbe = 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"expected a non-empty partition filter on the codes scan:\n$plan")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("appendIvfPqIndex: frozen model — surviving ids score bit-unchanged, delta retrievable") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_append").toString
    val half = corpus.filter(col("vec_id") % 2 === 0)
    Similarity.buildIvfPqIndex(half, "vec_id", "embedding", tmp,
      nCells = 16, m = 4, codes = 16)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val before = canon(Similarity.queryIvfPqIndex(spark, tmp, queries,
      "vec_id", "embedding", K, nProbe = 4))
      .map { case (q, nn, s) => (q, nn) -> s }.toMap
    // delta: the odd half PLUS an exact duplicate of vector 0 under a
    // fresh id — the model must stay frozen through the append
    val dup = corpus.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Similarity.appendIvfPqIndex(
      corpus.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
        .unionByName(dup),
      "vec_id", "embedding", tmp)
    val after = canon(Similarity.queryIvfPqIndex(spark, tmp, queries,
      "vec_id", "embedding", K, nProbe = 4))
    // every surviving (query, nn) pair keeps its EXACT score: the model
    // is frozen, so old codes and ADC sums cannot move
    val survived = after.filter { case (q, nn, _) => before.contains((q, nn)) }
    assert(survived.nonEmpty)
    survived.foreach { case (q, nn, s) =>
      assert(s == before((q, nn)), s"score moved for ($q, $nn)") }
    // the appended duplicate of query 0's own vector must be retrievable
    // for query 0 (same cell as the query's top probe, near-max ADC)
    val q0 = after.filter(_._1 == 0L).map(_._2).toSet
    assert(q0.contains(100000L),
      s"appended exact duplicate must surface for its twin query, got $q0")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("persisted-index recall floors on the key-shifted x10 corpus (index maintenance guard)") {
    // The build/append/query plumbing is pinned bit-for-bit above; this
    // pins QUALITY under growth — recall@10 floors for the PERSISTED
    // ivfpq/opq paths on a 10x key-shifted corpus (the ScaleCorpus probe
    // shape: each replica re-ids the same vectors, so every true
    // neighbor recurs 10x and a broken cell layout or stale codebook
    // would crater recall rather than shave it). Floors pinned well
    // under first-measurement so fixture jitter never trips them, but a
    // silent maintenance regression (wrong partition key, rotation
    // drift, probe-set bug) does.
    val stride = 1L + corpus.agg(max(col("vec_id"))).head.getLong(0)
    val corpus10 = (0L until 10L).map { r =>
      corpus.select((col("vec_id") + lit(r * stride)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val truth10 = topSets(
      Similarity.bruteForceTopK(corpus10, queries, "vec_id", "embedding", K))
    def recall10(approx: DataFrame): Double = {
      val got = topSets(approx)
      val per = truth10.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    val tmp = java.nio.file.Files.createTempDirectory("x10_recall").toString
    Similarity.buildIvfPqIndex(corpus10, "vec_id", "embedding", s"$tmp/ivfpq",
      nCells = 16, m = 4, codes = 16)
    val rIvfPq = recall10(Similarity.queryIvfPqIndex(spark, s"$tmp/ivfpq",
      queries, "vec_id", "embedding", K, nProbe = 4))
    Similarity.buildOpqIndex(corpus10, "vec_id", "embedding", s"$tmp/opq",
      m = 4, codes = 16)
    val rOpq = recall10(Similarity.queryOpqIndex(spark, s"$tmp/opq",
      queries, "vec_id", "embedding", K))
    info(f"x10 persisted recall@$K: ivfpq(nProbe=4) $rIvfPq%.3f, opq $rOpq%.3f")
    assert(rIvfPq > 0.45, f"persisted ivfpq recall floor on x10 (got $rIvfPq%.3f)")
    assert(rOpq > 0.45, f"persisted opq recall floor on x10 (got $rOpq%.3f)")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("IR ivfpq-build / ivfpq-query: build-once-query-many declared as data; validate total") {
    import graft.ir.{Engine, EngineCtx, Node}
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_ir").toString
    val passedThrough = Engine.run(Node.fromJson(
      s"""{"action":"ivfpq-build","params":[{"id":"vec_id","vec":"embedding","path":"$tmp/idx"}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      corpus, EngineCtx(testMode = true)).taps("t")
    assert(passedThrough.count() == corpus.count(), "build is a pass-through sink")
    val out = Engine.run(Node.fromJson(
      s"""{"action":"ivfpq-query","params":[{"index-path":"$tmp/idx","id":"vec_id",
         | "vec":"embedding","k":$K,"probes":4}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      queries, EngineCtx(testMode = true)).taps("t").collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) <= K))
    for ((a, ps) <- Seq(
      "ivfpq-build" -> s"""{"id":"vec_id","vec":"embedding","path":"/nope"}""",
      "ivfpq-query" -> s"""{"index-path":"/nope","id":"vec_id","vec":"embedding","k":3}""")) {
      val v = Engine.validate(Node.fromJson(
        s"""{"action":"$a","params":[$ps],
           | "children":[{"action":"tap","params":["t"]}]}""".stripMargin),
        spark, EngineCtx(testMode = true), corpus.schema)
      assert(v.isEmpty, s"$a: ${v.mkString("; ")}")
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("procrustes recovers a known rotation from C = R*diag(+)") {
    // C = R0 · D with positive diagonal D  =>  SVD gives U = R0·sign-fix,
    // V = I-ish, and UV^T must reproduce R0
    val th = 0.6
    val r0 = Array(
      Array(math.cos(th), -math.sin(th), 0.0),
      Array(math.sin(th), math.cos(th), 0.0),
      Array(0.0, 0.0, 1.0))
    val diag = Array(3.0, 2.0, 0.5)
    val c = Array.tabulate(3, 3)((i, j) => r0(i)(j) * diag(j))
    val r = Similarity.procrustes(c)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(r(i)(j) - r0(i)(j)) < 1e-9, s"R[$i][$j]=${r(i)(j)} vs ${r0(i)(j)}")
  }

  test("OPQ identity model reproduces pqTopK bit-for-bit (the shared-oracle lever)") {
    val idModel = Similarity.opqIdentityModel(corpus, "vec_id", "embedding", m = 4, codes = 16)
    val a = Similarity.opqTopK(corpus, queries, "vec_id", "embedding", K, idModel)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", K, m = 4, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b, s"identity OPQ must equal PQ exactly (|a|=${a.size} |b|=${b.size})")
  }

  test("OPQ training: orthogonal rotation, distortion falls, recall >= plain PQ") {
    val trained = Similarity.opqTrain(corpus, "vec_id", "embedding",
      m = 4, codes = 16, iters = 3, lloydPerIter = 1)
    val d = trained.d
    // R^T R = I
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      for (r <- 0 until d) acc += trained.rotation(r)(i) * trained.rotation(r)(j)
      assert(math.abs(acc - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"R^T R [$i][$j] = $acc")
    }
    val idModel = Similarity.opqIdentityModel(corpus, "vec_id", "embedding", m = 4, codes = 16)
    val d0 = Similarity.opqDistortion(corpus, "embedding", idModel)
    val d1 = Similarity.opqDistortion(corpus, "embedding", trained)
    info(f"OPQ distortion: identity $d0%.5f -> trained $d1%.5f")
    assert(d1 < d0, "training must cut quantization distortion")
    val rPq = recall(Similarity.pqTopK(corpus, queries, "vec_id", "embedding", K,
      m = 4, codes = 16))
    val rOpq = recall(Similarity.opqTopK(corpus, queries, "vec_id", "embedding", K, trained))
    info(f"recall@$K: pq $rPq%.3f, opq $rOpq%.3f")
    assert(rOpq >= rPq - 0.02,
      f"OPQ recall $rOpq%.3f must not fall materially below PQ $rPq%.3f")
  }

  test("persisted OPQ index: stored-model query == in-memory operator bit-for-bit; IR chain") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("opq_idx").toString
    val model = Similarity.buildOpqIndex(corpus, "vec_id", "embedding",
      s"$tmp/idx", m = 4, codes = 16, iters = 2)
    def sets(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = sets(Similarity.opqTopK(corpus, queries, "vec_id", "embedding", K, model))
    val stored = sets(Similarity.queryOpqIndex(s, s"$tmp/idx", queries,
      "vec_id", "embedding", K))
    assert(stored == direct, "stored-index query must reproduce the operator exactly")
    // round trip of the model itself
    val loaded = Similarity.loadOpqModel(s, s"$tmp/idx")
    assert(loaded.rotation.flatten.toSeq == model.rotation.flatten.toSeq)
    assert(loaded.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    // IR: query the stored index declared as data
    val node = graft.ir.Node.fromJson(
      s"""{"action":"opq-query",
         | "params":[{"id":"vec_id","vec":"embedding","index-path":"$tmp/idx","k":$K}],
         | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    val irOut = sets(graft.ir.Engine.run(node, queries,
      graft.ir.EngineCtx(testMode = true)).taps("out"))
    assert(irOut == direct, "IR opq-query must match the operator")
    val v = graft.ir.Engine.validate(node, s, schema = queries.schema)
    assert(v.isEmpty, v.mkString("; "))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
