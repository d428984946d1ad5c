package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall measurement for the banded MinHash-LSH candidate generators
  * against EXACT Jaccard ground truth — the dedup twin of AnnRecallSpec:
  * the s-curve promises that pairs well above the banding threshold
  * `(1/b)^(1/r)` are found with high probability; a silent regression
  * (wrong band key, broken hash convention, dropped shingles) collapses
  * that recall and must fail loudly. Ground truth comes from
  * [[Dedup.ngramJaccard]] over ALL pairs of a controlled fixture whose
  * similarity tiers are constructed, not sampled.
  */
class DedupRecallSpec extends AnyFunSuite {
  import TestSpark.spark

  /** A controlled near-dup corpus: 30 base docs of 40 distinct-ish
    * tokens; each base doc gets a high-similarity twin (2 of 40 tokens
    * perturbed → shingle Jaccard ≈ 0.85) and a medium twin (10 of 40
    * perturbed). Unrelated docs share almost nothing (disjoint token
    * universes per base).
    */
  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val rows = (0 until 30).flatMap { b =>
      val toks = (0 until 40).map(i => s"w${b}x$i")
      def doc(perturb: Int, tag: Int): (Long, String) = {
        val t = toks.zipWithIndex.map { case (w, i) =>
          if (i % (40 / math.max(perturb, 1)) == 0 && perturb > 0) s"p${tag}q$i" else w
        }
        (b.toLong * 10 + tag, t.mkString(" "))
      }
      Seq((b.toLong * 10, toks.mkString(" ")), doc(2, 1), doc(10, 2))
    }
    rows.toDF("doc_id", "text")
  }

  private def allPairs: DataFrame = {
    val ids = corpus.select(col("doc_id").as("id1"))
    ids.crossJoin(corpus.select(col("doc_id").as("id2")))
      .filter(col("id1") < col("id2"))
  }

  private lazy val truth: Map[(Long, Long), Double] =
    Dedup.ngramJaccard(corpus, allPairs, "text", "doc_id")
      .select("id1", "id2", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private def recallAbove(candidates: Set[(Long, Long)], tau: Double): Double = {
    val want = truth.filter(_._2 >= tau).keySet
    assert(want.nonEmpty, s"fixture has no pairs with J >= $tau")
    want.intersect(candidates).size.toDouble / want.size
  }

  test("set-LSH recall: high above the banding threshold, s-curve ordering across tiers") {
    val (bands, rows, tau) = Dedup.lshPlan(8, 0.5)
    info(f"lshPlan(8, 0.5) -> bands=$bands rows=$rows threshold=$tau%.3f")
    val cands = Dedup.lshCandidates(corpus, "text", "doc_id", k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rHigh = recallAbove(cands, 0.8)   // the ~0.85 twins
    val rMid = recallAbove(cands, 0.35)   // includes the medium tier
    info(f"recall J>=0.8: $rHigh%.3f; J>=0.35: $rMid%.3f; candidates=${cands.size}")
    // k=8, r=2 → threshold ≈ 0.5: the 0.85 tier collides in some band
    // with prob ≈ 1-(1-0.85²)⁴ ≈ 0.95 per pair; pin 10pts under
    assert(rHigh >= 0.85, f"high-tier recall $rHigh%.3f")
    assert(rHigh >= rMid, "recall must not increase as the tier drops below threshold")
    // and the generator is not degenerate (returning all pairs would
    // also pass recall): unrelated cross-base pairs stay out
    val unrelated = cands.count { case (a, b) => a / 10 != b / 10 }
    assert(unrelated <= cands.size / 10,
      s"$unrelated of ${cands.size} candidates are cross-base noise")
  }

  test("AUTO guard on the organic recall fixture: resolves unlimited, recall identical (r14)") {
    // the default-guard promise quantified on the recall corpus: an
    // organic near-dup structure (90 docs, 3-way tiers) sits far inside
    // the 32-per-doc budget, so auto must resolve to unlimited and the
    // candidate set — hence every recall number above — is bit-identical
    val (auto, audit) = Dedup.lshCandidatesAudited(corpus, "text", "doc_id",
      k = 8, rowsPerBand = 2, cap = Dedup.BucketCap.Auto())
    assert(audit.get.resolvedMaxBucket == Long.MaxValue, s"audit: ${audit.get}")
    assert(audit.get.excludedBuckets == 0L)
    val unlimited = Dedup.lshCandidates(corpus, "text", "doc_id", k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == unlimited, "auto must not change the organic candidate set")
    assert(recallAbove(got, 0.8) >= 0.85)
  }

  test("AUTO guard on the hamming face: organic signatures resolve unlimited, pairs identical (r15)") {
    // the guarded pigeonhole-banded face must be zero-cost on organic
    // signature distributions, like the MinHash face above: the recall
    // corpus's simhash signatures have no degenerate all-equal bucket,
    // so auto resolves unlimited and the pair set is bit-identical
    val sigs = Dedup.simhashSigTable(corpus, "text", "doc_id")
    val (autoPairs, audit) = Dedup.hammingNearDupAudited(sigs, "__id", "simhash",
      sigBits = 32, maxHamming = 3, cap = Dedup.BucketCap.Auto())
    assert(audit.get.resolvedMaxBucket == Long.MaxValue, s"audit: ${audit.get}")
    assert(audit.get.excludedBuckets == 0L && audit.get.excludedMembers == 0L)
    val unlimited = Dedup.hammingNearDupAudited(sigs, "__id", "simhash",
      sigBits = 32, maxHamming = 3, cap = Dedup.BucketCap.Unlimited)._1
    assert(autoPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == unlimited.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "auto must not change the organic hamming pair set")
  }

  test("AUTO guard on the embedding sign-bucket face: organic vectors resolve unlimited (r15)") {
    val s = spark
    import s.implicits._
    // organic embedding fixture: 40 seeded-random unit-ish vectors plus
    // 10 planted near-dup twins (tiny perturbations) — near-dups share
    // sign buckets, but no bucket is degenerate
    val rng = new scala.util.Random(1515L)
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))
    }
    val twins = base.take(10).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val (autoPairs, audit) = Dedup.embeddingNearDupBucketedAudited(
      emb, "vec_id", "embedding", threshold = 0.9, bits = 4,
      cap = Dedup.BucketCap.Auto())
    assert(audit.get.resolvedMaxBucket == Long.MaxValue, s"audit: ${audit.get}")
    assert(audit.get.excludedBuckets == 0L)
    val unlimited = Dedup.embeddingNearDupBucketed(
      emb, "vec_id", "embedding", threshold = 0.9, bits = 4,
      cap = Dedup.BucketCap.Unlimited)
    assert(autoPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == unlimited.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "auto must not change the organic embedding pair set")
    // the planted twins are actually found (the pin is not vacuous)
    assert(autoPairs.count() >= 8, "expected most planted twins to pair")
  }

  test("weighted-LSH recall on the multiset relation mirrors the set variant on repeat-free docs") {
    // on a repeat-free corpus every shingle count is 1, so the multiset
    // relation degenerates to the set relation — same ground truth applies
    val cands = Dedup.weightedLshCandidates(corpus, "text", "doc_id",
        k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rHigh = recallAbove(cands, 0.8)
    info(f"weighted recall J>=0.8: $rHigh%.3f; candidates=${cands.size}")
    assert(rHigh >= 0.85, f"high-tier recall $rHigh%.3f")
  }

  test("jaccardPrefixJoin: EXACT — equals brute-force token-set Jaccard, recall 1.0, nothing below t") {
    val t = 0.5
    // independent brute-force token-SET ground truth (whitespace≈regex
    // tokens here: the fixture is lowercase alnum)
    val sets = corpus.collect().map { r =>
      r.getLong(0) -> r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    }.toMap
    val want = (for {
      (i1, s1) <- sets; (i2, s2) <- sets if i1 < i2
      j = s1.intersect(s2).size.toDouble / s1.union(s2).size
      if j >= t
    } yield (i1, i2) -> j).toMap
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    val got = Dedup.jaccardPrefixJoin(corpus, "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet,
      s"exact join must find exactly the qualifying pairs (missing=${(want.keySet -- got.keySet).take(3)}, extra=${(got.keySet -- want.keySet).take(3)})")
    want.foreach { case (k, j) =>
      assert(math.abs(got(k) - j) < 1e-12, s"jaccard value mismatch at $k") }
    assert(got.values.forall(_ >= t))
  }

  /** Reference Levenshtein for the confirm-stage tests — the classic
    * O(nm) two-row DP, independent of Spark's implementation.
    */
  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1); cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("editConfirm: exact bounded distances on known pairs; minSim filter; truncation; empty texts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "kitten"), (2L, "sitting"),              // d=3, n=7, sim=4/7
      (3L, "the quick brown fox"), (4L, "the quick brown fix"), // d=1
      (5L, ""), (6L, ""),                           // both empty: sim 1.0
      (7L, "abcdefgh"), (8L, "zzzzzzzz")            // disjoint: sim 0
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id1", "id2")
    val all = Dedup.editConfirm(docs, pairs, "text", "doc_id", minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(all((1L, 2L)) == ((3L, 1.0 - 3.0 / 7.0)), s"kitten/sitting: $all")
    assert(all.values.exists { case (d, _) => d == 1L }, "fox/fix must be distance 1")
    assert(all.exists { case (k, (d, sim)) => d == 0L && sim == 1.0 },
      "both-empty pair must confirm at sim 1.0")
    // threshold drops the disjoint pair but keeps the near-identical ones
    val filtered = Dedup.editConfirm(docs, pairs, "text", "doc_id", minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!filtered.contains((8L, 7L)) && !filtered.contains((7L, 8L)),
      "disjoint pair must fail a 0.5 confirm")
    assert(filtered.size == 3, s"three pairs survive 0.5: $filtered")
    // truncation: beyond maxLen the texts are identical prefixes
    val trunc = Dedup.editConfirm(docs.withColumn("text",
        when(col("doc_id") === 7L, lit("same prefix AAAA")).when(col("doc_id") === 8L,
          lit("same prefix BBBB")).otherwise(col("text"))),
      Seq((7L, 8L)).toDF("id1", "id2"), "text", "doc_id", minSim = 0.9, maxLen = 11)
      .collect()
    assert(trunc.length == 1 && trunc(0).getDouble(3) == 1.0,
      "maxLen=11 sees only the shared prefix -> sim 1.0")
  }

  test("editConfirm: bounded early-exit equals the unbounded reference DP on LSH candidates") {
    val minSim = 0.3
    val cands = Dedup.lshCandidates(corpus, "text", "doc_id", k = 8, rowsPerBand = 2)
    val got = Dedup.editConfirm(corpus, cands, "text", "doc_id", minSim, maxLen = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1).take(200)).toMap
    val want = cands.collect().map(r => (r.getLong(0), r.getLong(1))).distinct.flatMap {
      case (i1, i2) =>
        val (a, b) = (texts(i1), texts(i2)); val n = math.max(a.length, b.length)
        val d = lev(a, b)
        if (n == 0 || d <= (1.0 - minSim) * n)
          Some((i1, i2) -> (d.toLong, if (n == 0) 1.0 else 1.0 - d.toDouble / n))
        else None
    }.toMap
    assert(got.keySet == want.keySet,
      s"surviving sets differ: missing=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
    want.foreach { case (k, (d, sim)) =>
      assert(got(k)._1 == d && math.abs(got(k)._2 - sim) < 1e-12, s"mismatch at $k") }
  }

  test("editConfirmFunnel (fused single-pass) equals the staged composition, incl. duplicate ids") {
    val s = TestSpark.spark
    import s.implicits._
    for ((df, tag) <- Seq(corpus -> "unique-ids",
      corpus.union(corpus.limit(4)) -> "duplicate-ids")) {
      val staged = {
        val p = Dedup.lshCandidates(df, "text", "doc_id", k = 8, rowsPerBand = 2)
        val jp = Dedup.ngramJaccard(df, p, "text", "doc_id")
          .filter(col("jaccard") >= 0.3).select("id1", "id2")
        Dedup.editConfirm(df, jp, "text", "doc_id", minSim = 0.5, maxLen = 200)
          .collect().map(_.toSeq).toSet
      }
      val fused = Dedup.editConfirmFunnel(df, "text", "doc_id",
        minJaccard = 0.3, minSim = 0.5, maxLen = 200, k = 8, rowsPerBand = 2)
        .collect().map(_.toSeq).toSet
      assert(fused == staged, tag)
    }
  }

  test("maxBucketPlan: planted mega-bucket drives the recommendation; clean corpus hits the floor") {
    val s = TestSpark.spark
    import s.implicits._
    def rec(plan: org.apache.spark.sql.Row, fraction: Double): Long =
      math.max(16L, math.ceil(4.0 * plan.getAs[Long]("max_bucket") / fraction).toLong)
    val clean = (1L to 200L).map(i =>
      (i, s"unique alpha$i beta$i gamma$i delta$i epsilon$i")).toDF("doc_id", "text")
    val pc = Dedup.maxBucketPlan(clean, "text", "doc_id", fraction = 1.0).collect().head
    // near-unique docs: recommendation is self-consistent and floored
    assert(pc.getAs[Long]("recommended_max_bucket") == rec(pc, 1.0))
    assert(pc.getAs[Long]("max_bucket") <= 4L,
      "distinct-shingle docs should not form large buckets")
    assert(pc.getAs[Long]("recommended_max_bucket") >= 16L)
    // planted boilerplate clique: 100 identical docs collide in EVERY band
    val boiler = (1L to 100L).map(i =>
      (1000L + i, "the same boilerplate header text repeated verbatim"))
      .toDF("doc_id", "text")
    val mixed = clean.unionByName(boiler)
    val pm = Dedup.maxBucketPlan(mixed, "text", "doc_id", fraction = 1.0).collect().head
    assert(pm.getAs[Long]("max_bucket") >= 100L, "the clique is the max bucket")
    assert(pm.getAs[Long]("recommended_max_bucket") == rec(pm, 1.0))
    assert(pm.getAs[Long]("p99_bucket") <= pm.getAs[Long]("max_bucket"))
    assert(pm.getAs[Long]("n_sampled") == 300L)
    // sampled probe extrapolates: fraction 0.5 sees ~half the clique but
    // recommends in the same regime as the full-corpus plan
    val ph = Dedup.maxBucketPlan(mixed, "text", "doc_id", fraction = 0.5).collect().head
    assert(ph.getAs[Long]("recommended_max_bucket") == rec(ph, 0.5))
    assert(ph.getAs[Long]("recommended_max_bucket") >= 200L &&
      ph.getAs[Long]("recommended_max_bucket") <= 800L,
      s"extrapolated recommendation out of regime: $ph")
    // declared as data: the IR action reproduces the operator exactly
    import graft.ir.{Engine, EngineCtx, Node}
    val viaIr = Engine.run(Node.fromJson(
      """{"action":"lsh-cap-plan","params":[{"text":"text","id":"doc_id","fraction":1.0}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      mixed, EngineCtx(testMode = true)).taps("out").collect().head
    assert(viaIr.toSeq == pm.toSeq)
  }

  test("dupRateEstimate: reproducible, catches planted duplicates, extrapolation law") {
    val s = TestSpark.spark
    import s.implicits._
    // 40 docs; every doc with id >= 20 is a copy of id - 20
    val docs = (0L until 40L).map { i =>
      val base = i % 20
      (i, s"unique alpha$base beta$base gamma$base delta$base epsilon$base zeta$base")
    }.toDF("doc_id", "text")
    val full = graft.operators.Dedup.dupRateEstimate(docs, "text", "doc_id", 1.0)
      .collect().head
    assert(full.getLong(0) == 40L)
    assert(full.getLong(1) == 20L, "every copy loses to its twin at fraction 1")
    assert(full.getDouble(2) == 0.5)
    assert(full.getDouble(4) == full.getLong(3).toDouble, "fraction 1: no extrapolation")
    // deterministic under repartition and rerun
    val a = graft.operators.Dedup.dupRateEstimate(docs, "text", "doc_id", 0.5).collect().head
    val b = graft.operators.Dedup.dupRateEstimate(docs.repartition(7), "text", "doc_id", 0.5)
      .collect().head
    assert(a.toSeq == b.toSeq)
    // extrapolation law: est = n_pairs / fraction^2
    assert(a.getDouble(4) == a.getLong(3).toDouble / 0.25)

    import graft.ir.{Engine, EngineCtx, Node}
    val ir = Engine.run(Node.fromJson(
      """{"action":"dup-rate-estimate","params":[{"text":"text","id":"doc_id","fraction":1.0}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      docs, EngineCtx(testMode = true)).taps("out").collect().head
    assert(ir.getLong(1) == 20L)
  }

  test("pairEval: canonicalization, exact counts, null-ratio edges, IR artifact face") {
    val s = spark
    import s.implicits._
    // pred contains a REVERSED duplicate of (1,2), a self-pair, and a
    // plain duplicate — canonicalization must collapse all of that
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 3L), (4L, 5L), (4L, 5L), (6L, 7L))
      .toDF("id1", "id2")
    val truth = Seq((2L, 1L), (5L, 4L), (8L, 9L)).toDF("id1", "id2")
    val r = Dedup.pairEval(pred, truth).collect().head
    // canonical pred = {(1,2),(4,5),(6,7)}; truth = {(1,2),(4,5),(8,9)}
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)), r.toString)
    assert(r.getDouble(3) == 2.0 / 3 && r.getDouble(4) == 2.0 / 3)
    assert(r.getDouble(5) == 4.0 / 6)
    // no predictions: precision null, recall 0, f1 defined by fn
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val r2 = Dedup.pairEval(empty, truth).collect().head
    assert(r2.getLong(0) == 0L && r2.isNullAt(3) && r2.getDouble(4) == 0.0)
    // both empty: everything null except the zero counts
    val r3 = Dedup.pairEval(empty, empty).collect().head
    assert(r3.getLong(0) == 0L && r3.isNullAt(3) && r3.isNullAt(4) && r3.isNullAt(5))

    // IR face: truth arrives as a parquet artifact
    import graft.ir.{Engine, EngineCtx, Node}
    val tmp = java.nio.file.Files.createTempDirectory("paireval").toString
    truth.write.mode("overwrite").parquet(s"$tmp/truth")
    val ir = Engine.run(Node.fromJson(
      s"""{"action":"dedup-pair-eval","params":[{"truth-path":"$tmp/truth"}],
         | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      pred, EngineCtx(testMode = true)).taps("out").collect().head
    assert(ir.toSeq == r.toSeq)
    // validate is total without the artifact existing
    assert(Engine.validate(Node.fromJson(
      """{"action":"dedup-pair-eval","params":[{"truth-path":"/does/not/exist"}],
        | "children":[]}""".stripMargin), s, schema = pred.schema).isEmpty)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("pairEvalSweep: one-pass PR curve == pairEval at each threshold; max-score dedup; absent truth = fn everywhere") {
    val s = spark
    import s.implicits._
    val scored = Seq(
      (1L, 2L, 0.9), (2L, 1L, 0.4), // duplicate orientation: max score 0.9 wins
      (4L, 5L, 0.6),
      (6L, 7L, 0.2)).toDF("id1", "id2", "score")
    val truth = Seq((1L, 2L), (4L, 5L), (8L, 9L)).toDF("id1", "id2")
    val grid = Seq(0.1, 0.5, 0.95)
    val sweep = Dedup.pairEvalSweep(scored, truth, grid)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // t=0.1: pred {12,45,67} -> tp 2 fp 1 fn 1; t=0.5: pred {12,45} ->
    // tp 2 fp 0 fn 1; t=0.95: pred {} -> tp 0 fp 0 fn 3
    assert(sweep == Map(0.1 -> ((2L, 1L, 1L)), 0.5 -> ((2L, 0L, 1L)),
      0.95 -> ((0L, 0L, 3L))), s"sweep: $sweep")
    // each grid point agrees with the single-threshold pairEval
    grid.foreach { th =>
      val single = Dedup.pairEval(
        scored.filter(col("score") >= th).select("id1", "id2"), truth)
        .collect().head
      assert((single.getLong(0), single.getLong(1), single.getLong(2)) == sweep(th),
        s"threshold $th disagrees with pairEval")
    }
  }
}
