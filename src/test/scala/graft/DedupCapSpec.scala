package graft

import graft.operators.Dedup
import graft.operators.Dedup.{BucketCap, LshAudit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r14 mega-bucket guard contract: [[BucketCap.Auto]] — the new
  * DEFAULT for every LSH-composing IR action — must (a) NEVER cap a
  * clean corpus into approximation (auto resolves to unlimited whenever
  * the corpus's total candidate emissions fit the linear budget, so the
  * planted ORGANIC max bucket always survives), (b) bound an adversarial
  * corpus to a finite cap equal to what an explicit Fixed cap at the
  * same value produces, and (c) account for what it dropped in the
  * [[LshAudit]] row (the in-band "near-dups exempted by cap" signal).
  */
class DedupCapSpec extends AnyFunSuite {
  import TestSpark.spark

  // ---- solveBucketCap: pure driver arithmetic ----

  test("solveBucketCap: within-budget histogram resolves to unlimited") {
    // 100 buckets of 2 + 10 of 5 = 100*1 + 10*10 = 200 emissions
    val hist = Seq((2L, 100L), (5L, 10L))
    assert(Dedup.solveBucketCap(hist, nDocs = 100L, pairsPerDoc = 2.0, floor = 16)
      == Long.MaxValue)
  }

  test("solveBucketCap: over-budget picks the largest size whose cumulative fits") {
    // sizes 2 (100 buckets, 100 pairs), 10 (10 buckets, 450), 1000 (1, 499500)
    val hist = Seq((2L, 100L), (10L, 10L), (1000L, 1L))
    // budget 1000 >= 100+450 but < +499500 -> cap at 10
    assert(Dedup.solveBucketCap(hist, 1000L, 1.0, floor = 2) == 10L)
    // budget 200 >= 100 but < 550 -> cap at 2... floored to 16
    assert(Dedup.solveBucketCap(hist, 200L, 1.0, floor = 16) == 16L)
    assert(Dedup.solveBucketCap(hist, 200L, 1.0, floor = 2) == 2L)
  }

  test("solveBucketCap: nothing fits -> floor") {
    val hist = Seq((100L, 50L))
    assert(Dedup.solveBucketCap(hist, 10L, 1.0, floor = 16) == 16L)
  }

  test("solveBucketCap: empty histogram is unlimited") {
    assert(Dedup.solveBucketCap(Nil, 0L, 32.0, 16) == Long.MaxValue)
  }

  test("solveBucketCap: a 10^11-member bucket cannot overflow the guard off") {
    // s(s-1)/2 overflows Long at s > 4.3e9; a wrapped-negative emission
    // count would make the pathological corpus look within budget
    val hist = Seq((2L, 1000L), (100000000000L, 1L))
    val cap = Dedup.solveBucketCap(hist, nDocs = 100000000000L, pairsPerDoc = 32.0, floor = 16)
    assert(cap != Long.MaxValue && cap == 16L, s"got $cap")
  }

  test("solveBucketCap == brute-force reference over seeded random histograms") {
    val rng = new scala.util.Random(14014L)
    (1 to 300).foreach { _ =>
      val hist = (1 to 1 + rng.nextInt(8))
        .map(_ => (1L + rng.nextInt(50), 1L + rng.nextInt(20)))
        .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      val nDocs = hist.map { case (s, n) => s * n }.sum / 4
      val ppd = 0.5 + rng.nextDouble() * 8
      val floor = 2 + rng.nextInt(10)
      val got = Dedup.solveBucketCap(hist, nDocs, ppd, floor)
      val budget = math.ceil(ppd * nDocs).toLong
      def pairs(cap: Long) =
        hist.filter(_._1 <= cap).map { case (s, n) => n * s * (s - 1) / 2 }.sum
      if (pairs(hist.map(_._1).max) <= budget) assert(got == Long.MaxValue)
      else {
        val best = hist.map(_._1).filter(s => pairs(s) <= budget)
          .maxOption.getOrElse(0L)
        assert(got == math.max(floor.toLong, best),
          s"hist=$hist nDocs=$nDocs ppd=$ppd floor=$floor got=$got")
      }
    }
  }

  // ---- fixtures ----

  /** Clean corpus: 120 token-disjoint docs PLUS one planted organic
    * near-dup cluster of 24 near-identical members — the largest bucket
    * is the organic cluster, and the whole corpus's emissions sit far
    * inside the 32-per-doc budget.
    */
  private lazy val clean: DataFrame = {
    val s = spark
    import s.implicits._
    val uniques = (0 until 120).map { i =>
      (i.toLong, (0 until 30).map(j => s"u${i}w$j").mkString(" "))
    }
    val cluster = (0 until 24).map { i =>
      (1000L + i, (0 until 30).map(j => s"cw$j").mkString(" ") + s" tail$i")
    }
    (uniques ++ cluster).toDF("doc_id", "text")
  }

  /** Adversarial corpus: the SAME docs replicated 50× with a replica
    * token appended (the ScaleCorpus convention) — every band bucket
    * multiplies ~50×, emissions turn quadratic, and an unguarded run
    * would pay ~50² pairs per original bucket.
    */
  private lazy val adversarial: DataFrame =
    clean.withColumn("rep", explode(sequence(lit(0L), lit(49L))))
      .select((col("doc_id") + col("rep") * 100000L).as("doc_id"),
        when(col("rep") === 0L, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"))

  // ---- auto on a clean corpus: no capping, planted organic max survives ----

  test("auto resolves unlimited on a clean corpus; organic cluster uncapped") {
    val (pairs, audit) =
      Dedup.lshCandidatesAudited(clean, "text", "doc_id", cap = BucketCap.Auto())
    val a = audit.get
    assert(a.resolvedMaxBucket == Long.MaxValue,
      s"clean corpus must not be capped, got $a")
    assert(a.excludedBuckets == 0L && a.excludedMembers == 0L)
    // auto >= the planted organic max: the 24-member cluster's bucket is
    // the corpus's largest and it survives whole
    assert(a.largestBucket >= 24L)
    val unlimited = Dedup.lshCandidates(clean, "text", "doc_id")
    assert(pairs.orderBy("id1", "id2").collect().toSeq
      == unlimited.orderBy("id1", "id2").collect().toSeq)
    // the organic cluster is fully pair-connected (24 choose 2 pairs
    // among ids 1000..1023)
    val clusterPairs = pairs.filter(col("id1") >= 1000L && col("id2") < 1024L).count()
    assert(clusterPairs == 24L * 23 / 2)
  }

  // ---- auto on an adversarial corpus: finite cap == Fixed at same value ----

  test("auto caps an adversarial corpus; pairs == Fixed(resolved); audit accounts") {
    val (autoPairs, audit) =
      Dedup.lshCandidatesAudited(adversarial, "text", "doc_id", cap = BucketCap.Auto())
    val a = audit.get
    assert(a.resolvedMaxBucket != Long.MaxValue && a.resolvedMaxBucket >= 16L,
      s"adversarial corpus must resolve a finite cap, got $a")
    assert(a.excludedBuckets > 0L && a.excludedMembers > a.excludedBuckets)
    assert(a.largestBucket > a.resolvedMaxBucket)
    // equivalence with the explicit guard at the resolved value
    val fixed = Dedup.lshCandidates(adversarial, "text", "doc_id",
      cap = BucketCap.Fixed(a.resolvedMaxBucket.toInt))
    assert(autoPairs.orderBy("id1", "id2").collect().toSeq
      == fixed.orderBy("id1", "id2").collect().toSeq)
    // audit counts re-derivable from the corpus's own histogram
    val hist = Dedup.bandTable(adversarial, "text", "doc_id")
      .groupBy("band", "sig").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a.nBuckets == hist.map(_._2).sum)
    assert(a.largestBucket == hist.last._1)
    assert(a.excludedBuckets == hist.filter(_._1 > a.resolvedMaxBucket).map(_._2).sum)
    assert(a.excludedMembers ==
      hist.filter(_._1 > a.resolvedMaxBucket).map { case (s, n) => s * n }.sum)
    // and the budget property itself: kept emissions fit, kept+smallest
    // excluded size would not
    val budget = math.ceil(32.0 * a.nDocs).toLong
    val kept = hist.filter(_._1 <= a.resolvedMaxBucket)
      .map { case (s, n) => n * (s * (s - 1) / 2) }.sum
    assert(kept <= budget)
  }

  test("unlimited audit is None; Fixed audit counts the drop") {
    val (_, none) = Dedup.lshCandidatesAudited(clean, "text", "doc_id",
      cap = BucketCap.Unlimited)
    assert(none.isEmpty)
    val (_, fx) = Dedup.lshCandidatesAudited(clean, "text", "doc_id",
      cap = BucketCap.Fixed(10))
    val a = fx.get
    assert(a.resolvedMaxBucket == 10L)
    // the 24-member organic cluster is above the hand-set cap
    assert(a.excludedBuckets >= 1L && a.excludedMembers >= 24L)
  }

  // ---- carried through the composing operators ----

  test("pruneNearDupsAudited: schema + audit carried; capped == unlimited (star edges)") {
    val (prunedAuto, aAuto) = Dedup.pruneNearDupsAudited(
      adversarial, "text", "doc_id", cap = BucketCap.Auto())
    assert(prunedAuto.columns.toSeq == adversarial.columns.toSeq)
    assert(aAuto.get.excludedBuckets > 0L)
    // pruning is a CONNECTIVITY consumer: over-cap buckets contribute
    // member→bucket-min star edges with the same connected components
    // as their dropped pair cliques — so the pruned corpus under ANY
    // cap equals the unlimited run exactly (the r14 behavior, where a
    // capped bucket's members all survived as exempted, is gone)
    val survAuto = prunedAuto.select("doc_id").collect().map(_.getLong(0)).toSet
    val survUnlimited = Dedup.pruneNearDups(
        adversarial, "text", "doc_id", cap = BucketCap.Unlimited)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survAuto == survUnlimited)
    // same exactness under a hand-set low cap on the clean fixture:
    // the 24-member organic cluster collapses to its min id even
    // though every one of its buckets is over the cap
    val (prunedLow, _) = Dedup.pruneNearDupsAudited(
      clean, "text", "doc_id", cap = BucketCap.Fixed(3))
    val survivors = prunedLow.filter(col("doc_id") >= 1000L && col("doc_id") < 1024L)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1000L))
  }

  test("editConfirmFunnelAudited == staged composition under the same cap") {
    val capv = 30
    val (funnel, audit) = Dedup.editConfirmFunnelAudited(
      adversarial, "text", "doc_id", minJaccard = 0.3, minSim = 0.5,
      maxLen = 128, cap = BucketCap.Fixed(capv))
    assert(audit.get.resolvedMaxBucket == capv.toLong)
    val cands = Dedup.lshCandidates(adversarial, "text", "doc_id",
      cap = BucketCap.Fixed(capv))
    val staged = Dedup.editConfirm(
      adversarial, Dedup.ngramJaccard(adversarial, cands, "text", "doc_id")
        .filter(col("jaccard") >= 0.3).select("id1", "id2"),
      "text", "doc_id", 0.5, 128)
    assert(funnel.select("id1", "id2", "edit_dist").orderBy("id1", "id2").collect().toSeq
      == staged.select("id1", "id2", "edit_dist").orderBy("id1", "id2").collect().toSeq)
  }

  // ---- the shared kernel's other faces: weighted MinHash, hamming bands ----

  test("weightedLshCandidatesAudited: same guard kernel; unlimited face unchanged") {
    val (autoPairs, audit) = Dedup.weightedLshCandidatesAudited(
      adversarial, "text", "doc_id", cap = BucketCap.Auto())
    val a = audit.get
    assert(a.resolvedMaxBucket != Long.MaxValue && a.excludedBuckets > 0L)
    val fixed = Dedup.weightedLshCandidatesAudited(adversarial, "text", "doc_id",
      cap = BucketCap.Fixed(a.resolvedMaxBucket.toInt))._1
    assert(autoPairs.orderBy("id1", "id2").collect().toSeq
      == fixed.orderBy("id1", "id2").collect().toSeq)
    // the audit-free face defaults to Auto, which resolves unlimited on
    // the clean fixture — bit-identical to the explicit Unlimited run
    val legacy = Dedup.weightedLshCandidates(clean, "text", "doc_id")
    val unlimited = Dedup.weightedLshCandidatesAudited(clean, "text", "doc_id",
      cap = BucketCap.Unlimited)._1
    assert(legacy.orderBy("id1", "id2").collect().toSeq
      == unlimited.orderBy("id1", "id2").collect().toSeq)
  }

  test("hammingNearDupAudited: all-zero-signature mega-bucket capped, organic pairs kept") {
    val s = spark
    import s.implicits._
    // 2000 all-zero signatures (the empty-doc/black-image bucket) + one
    // organic near-dup pair at hamming 1 + isolated far signatures
    val sigs = ((0L until 2000L).map(i => (i, 0L)) ++
      Seq((5000L, 0x0F0F0F0FL), (5001L, 0x0F0F0F0EL), (6000L, 0x7A5A5A5AL)))
      .toDF("id", "sig")
    val (pairs, audit) = Dedup.hammingNearDupAudited(sigs, "id", "sig",
      sigBits = 32, maxHamming = 1, cap = BucketCap.Auto())
    val a = audit.get
    assert(a.excludedBuckets > 0L, s"zero-bucket must be capped: $a")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the organic pair survives; the zero clique's 2M pairs do not
    assert(got == Set((5000L, 5001L, 1L)), s"got $got")
    // unlimited face still finds the clique (legacy behavior intact)
    val unl = Dedup.hammingNearDup(
      Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "sig"), "id", "sig", 32, 1)
    assert(unl.count() == 3L) // (1,2,0),(1,3,1),(2,3,1)
  }

  test("cross-corpus weighted twin: per-side caps, BOTH sides' audits returned") {
    val (pairs, auditL, auditR) = Dedup.weightedCrossCorpusCandidatesAudited(
      adversarial, clean, "text", "doc_id",
      capLeft = BucketCap.Auto(), capRight = BucketCap.Auto())
    // the adversarial left side resolves a finite cap; the clean right
    // side resolves unlimited — two independent accounts, one per corpus
    assert(auditL.get.resolvedMaxBucket != Long.MaxValue && auditL.get.excludedBuckets > 0L,
      s"left: ${auditL.get}")
    assert(auditR.get.resolvedMaxBucket == Long.MaxValue && auditR.get.excludedBuckets == 0L,
      s"right: ${auditR.get}")
    // a dropped home bucket finds no partners: the mega-clique's pairs
    // are bounded while clean-side organics still join
    assert(pairs.count() >= 0L) // shape-sane; exact values pinned by the gates
  }

  test("preflightWarnings: split-by-hash feeding decontam warns; cluster-split does not") {
    import graft.ir.Node
    def chain(split: String) = Node.fromJson(
      s"""{"action":"$split","params":[{"id":"doc_id",
         |   "weights":[{"name":"train","weight":0.9},{"name":"bench","weight":0.1}]}],
         | "children":[{"action":"where","params":[["=","host","x"]],
         |              "children":[{"action":"decontam-exact",
         |                           "params":[{"id":"doc_id","text":"text",
         |                                      "bench-path":"/tmp/nope"}]}]}]}""".stripMargin)
    val warns = graft.ir.Engine.preflightWarnings(chain("split-by-hash"))
    assert(warns.size == 1 && warns.head.contains("cluster-split"),
      s"expected the leakage warning, got $warns")
    assert(graft.ir.Engine.preflightWarnings(chain("cluster-split")).isEmpty,
      "cluster-split composes leakage-free: no warning")
    // split-by-hash with no decontam downstream is fine too
    val plain = Node.fromJson(
      """{"action":"split-by-hash","params":[{"id":"doc_id",
        |   "weights":[{"name":"a","weight":1.0}]}]}""".stripMargin)
    assert(graft.ir.Engine.preflightWarnings(plain).isEmpty)
  }

  test("dupRateEstimate under auto: dup_rate/n_dup EXACT on the duplicate-heavy corpus it exists to detect") {
    // the probe's whole job is detecting dup-heavy corpora; a guard that
    // silently zeroed dup_rate there would greenlight the footgun chain
    // the preflight lint warns about. The connectivity face keeps the
    // component-derived numbers exact under the default cap; only the
    // raw pair counts can lower-bound.
    def row(cap: BucketCap) = Dedup.dupRateEstimate(
      adversarial, "text", "doc_id", fraction = 1.0, cap = cap).collect().head
    val auto = row(BucketCap.Auto())
    val unlimited = row(BucketCap.Unlimited)
    assert(auto.getAs[Long]("n_sampled") == unlimited.getAs[Long]("n_sampled"))
    assert(auto.getAs[Long]("n_dup") == unlimited.getAs[Long]("n_dup"),
      s"n_dup must be exact under auto: ${auto} vs ${unlimited}")
    assert(auto.getAs[Double]("dup_rate") == unlimited.getAs[Double]("dup_rate"))
    assert(auto.getAs[Long]("n_dup") > 0L, "the adversarial fixture IS duplicate-heavy")
    // pair counts lower-bound under capping (stars replace cliques)
    assert(auto.getAs[Long]("n_pairs") <= unlimited.getAs[Long]("n_pairs"))
  }

  test("semanticDedup mega-cell guard: degenerate cell routed to linear root-verify, result exact") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(1516L)
    // 60 organic vectors (balanced cells) + 1,500 near-identical planted
    // vectors that all argmax onto one cell — the mega-cell hazard
    val organic = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat))
    }
    val base = Array.fill(8)(1.0f)
    val planted = (0 until 1500).map { i =>
      (10000L + i, base.map(x => x + 0.001f * rng.nextGaussian().toFloat))
    }
    val emb = (organic ++ planted).toDF("vec_id", "embedding")
    // factor 4 (the default 32x expected = 3,120 sits above this small
    // fixture's 1,500-member planted cell; the rule is structural —
    // factor x n/cells — so the fixture pins it at a tighter factor)
    val (guarded, audit) = graft.operators.Similarity.semanticDedupAudited(
      emb, "vec_id", "embedding", nCells = 16, threshold = 0.9,
      maxCellFactor = 4.0)
    val a = audit.get
    assert(a.excludedBuckets >= 1L && a.excludedMembers >= 1500L,
      s"the planted cell must trip the guard: $a")
    // on the degenerate cell every member matches the root, so the
    // linear root-verify equals the unguarded quadratic run exactly
    val unlimited = graft.operators.Similarity.semanticDedup(
      emb, "vec_id", "embedding", nCells = 16, threshold = 0.9,
      maxCellFactor = 1e9)
    assert(guarded.select("vec_id").collect().map(_.getLong(0)).toSet
      == unlimited.select("vec_id").collect().map(_.getLong(0)).toSet,
      "guarded result must equal unlimited on the degenerate fixture")
    // the planted family collapsed to its min id (not exempted whole)
    val survivors = guarded.filter(col("vec_id") >= 10000L).count()
    assert(survivors == 1L, s"planted family must collapse, got $survivors")
    // organic corpora never trip the guard (balanced cells)
    val (_, organicAudit) = graft.operators.Similarity.semanticDedupAudited(
      organic.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCells = 8, threshold = 0.9)
    assert(organicAudit.get.excludedBuckets == 0L, s"organic: $organicAudit")
  }

  test("semanticDedup sub-cell re-split: MIXED mega cell (two dissimilar families + singletons) == unlimited") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(1617L)
    // 60 organic vectors seed the 16 cells (lowest ids 0-15 become the
    // centroids); everything planted below argmaxes onto cell 0 = v0
    val organic = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat))
    }
    val v0 = organic.head._2.map(_.toDouble)
    val n0 = math.sqrt(v0.map(x => x * x).sum)
    val v0n = v0.map(_ / n0)
    // deterministic unit vector orthogonal to v0 from a gaussian draw
    def ortho(): Array[Double] = {
      val g = Array.fill(8)(rng.nextGaussian())
      val d = g.zip(v0n).map { case (x, y) => x * y }.sum
      val o = g.zip(v0n).map { case (x, y) => x - d * y }
      val no = math.sqrt(o.map(x => x * x).sum)
      o.map(_ / no)
    }
    def mix(c: Double, u: Array[Double]): Array[Float] = {
      val sqs = math.sqrt(1 - c * c)
      v0n.zip(u).map { case (a, b) => (c * a + sqs * b).toFloat }
    }
    // family bases: cosine(vA, c0) = 1, cosine(vB, c0) = 0.8,
    // cosine(vA, vB) ~ 0.8 < the 0.9 threshold — two families in ONE
    // cell that must NOT merge; 6 in-cell singletons on ORTHONORMAL
    // off-axis directions: pairwise cos = 0.82^2 + 0.33*0 = 0.67,
    // deterministically below threshold (random directions in the
    // 7-dim complement would collide above 0.9)
    val uB = ortho()
    val famA = (0 until 700).map { i =>
      (10000L + i, v0.map(x => (x + 0.001 * rng.nextGaussian()).toFloat))
    }
    val vB = mix(0.8, uB).map(_.toDouble)
    val famB = (0 until 700).map { i =>
      (20000L + i, vB.map(x => (x + 0.001 * rng.nextGaussian()).toFloat))
    }
    // Gram-Schmidt the standard basis against v0n -> 6 orthonormal
    // complement directions (deterministic)
    val basis = scala.collection.mutable.ArrayBuffer[Array[Double]](v0n)
    var bi = 0
    while (basis.size < 7 && bi < 8) {
      val e = Array.tabulate(8)(j => if (j == bi) 1.0 else 0.0)
      val r = basis.foldLeft(e) { (acc, b) =>
        val d = acc.zip(b).map { case (x, y) => x * y }.sum
        acc.zip(b).map { case (x, y) => x - d * y }
      }
      val nr = math.sqrt(r.map(x => x * x).sum)
      if (nr > 1e-6) basis += r.map(_ / nr)
      bi += 1
    }
    val singles = (0 until 6).map { i =>
      (100L + i, mix(0.82, basis(i + 1)))
    }
    val emb = (organic.map { case (i, v) => (i, v.toSeq) } ++
      singles.map { case (i, v) => (i, v.toSeq) } ++
      famA.map { case (i, v) => (i, v.toSeq) } ++
      famB.map { case (i, v) => (i, v.toSeq) }).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // factor 8: cap = ceil(8 * 1466/16) = 733 — the ~1,407-member cell
    // trips the guard; stage 1 shatters both families across near-tied
    // seeds, and the stage-2 survivor cross-check closes every
    // cross-sub-cell pair, so the guarded result is exact
    val (guarded, audit) = graft.operators.Similarity.semanticDedupAudited(
      emb, "vec_id", "embedding", nCells = 16, threshold = 0.9,
      maxCellFactor = 8.0)
    val a = audit.get
    assert(a.excludedBuckets >= 1L && a.excludedMembers >= 1400L,
      s"the mixed planted cell must trip the guard: $a")
    val unlimited = graft.operators.Similarity.semanticDedup(
      emb, "vec_id", "embedding", nCells = 16, threshold = 0.9,
      maxCellFactor = 1e9)
    val got = guarded.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = unlimited.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"sub-split must equal unlimited on the MIXED cell (r15 anchors could not): " +
        s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    // and the unlimited run itself behaves as constructed: family A
    // (clones of organic id 0's vector) is absorbed whole by id 0,
    // family B collapses to its min id, singletons all survive
    assert(guarded.filter(col("vec_id") >= 10000L && col("vec_id") < 20000L).count() == 0L)
    assert(guarded.filter(col("vec_id") === 0L).count() == 1L)
    assert(guarded.filter(col("vec_id") >= 20000L).count() == 1L)
    assert(guarded.filter(col("vec_id") >= 100L && col("vec_id") < 200L).count() == 6L,
      "in-cell singletons are below threshold to everything and must all survive")
  }

  // ---- IR faces: default auto, explicit overrides, audit-path ----

  private def runIr(json: String, input: DataFrame): DataFrame =
    graft.ir.Engine.run(graft.ir.Node.fromJson(json), input,
      graft.ir.EngineCtx(testMode = true)).taps("out")

  test("IR dedup-minhash-lsh: default == auto; 'unlimited' and int override") {
    val tap = """"children":[{"action":"tap","params":["out"]}]"""
    val auto = runIr(
      s"""{"action":"dedup-minhash-lsh","params":[{"id":"doc_id","text":"text"}],$tap}""",
      adversarial)
    val (expAuto, a) = Dedup.lshCandidatesAudited(
      adversarial, "text", "doc_id", cap = BucketCap.Auto())
    assert(auto.count() == expAuto.count())
    val unlimited = runIr(
      s"""{"action":"dedup-minhash-lsh",
         | "params":[{"id":"doc_id","text":"text","max-bucket":"unlimited"}],$tap}""".stripMargin,
      adversarial)
    assert(unlimited.count() > auto.count(),
      "explicit unlimited must emit the mega-bucket pairs auto excluded")
    val fixed = runIr(
      s"""{"action":"dedup-minhash-lsh",
         | "params":[{"id":"doc_id","text":"text",
         |            "max-bucket":${a.get.resolvedMaxBucket}}],$tap}""".stripMargin,
      adversarial)
    assert(fixed.count() == auto.count())
    // pairs-per-doc override shifts the auto budget: a huge budget
    // resolves unlimited even here
    val big = runIr(
      s"""{"action":"dedup-minhash-lsh",
         | "params":[{"id":"doc_id","text":"text","max-bucket":"auto",
         |            "pairs-per-doc":100000.0}],$tap}""".stripMargin,
      adversarial)
    assert(big.count() == unlimited.count())
  }

  test("IR audit-path writes the guard's account as parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-capaudit").toString
    val path = s"$dir/audit"
    runIr(
      s"""{"action":"dedup-minhash-lsh",
         | "params":[{"id":"doc_id","text":"text","audit-path":"$path"}],
         | "children":[{"action":"tap","params":["out"]}]}""".stripMargin,
      adversarial).count()
    val audit = spark.read.parquet(path).collect()
    assert(audit.length == 1)
    val r = audit.head
    assert(r.getAs[Long]("excluded_buckets") > 0L)
    assert(r.getAs[Long]("resolved_max_bucket") >= 16L)
  }

  test("IR cluster-split default is bounded AND exact: capped split == unlimited split") {
    val tap = """"children":[{"action":"tap","params":["out"]}]"""
    def splitJson(extra: String) =
      s"""{"action":"cluster-split","params":[{"id":"doc_id","text":"text","salt":"cs",$extra
         |   "weights":[{"name":"train","weight":0.8},{"name":"val","weight":0.1},
         |              {"name":"test","weight":0.1}]}],$tap}""".stripMargin
    val split = runIr(splitJson(""), adversarial)
    // total and partition-complete despite the guard
    assert(split.count() == adversarial.count())
    assert(split.select("split").distinct().count() >= 2)
    // the connectivity face's star edges make the capped run EXACT: the
    // auto-guarded default assigns every document the same split as the
    // unguarded run — near-dup families never straddle the fence even
    // when their buckets blew the pair budget
    val unlimited = runIr(splitJson(""""max-bucket":"unlimited","""), adversarial)
    assert(split.orderBy("doc_id").select("doc_id", "split").collect().toSeq
      == unlimited.orderBy("doc_id").select("doc_id", "split").collect().toSeq)
  }

  test("IR on-excluded=fail aborts a capped pair-list run; connectivity faces exempt") {
    val tap = """"children":[{"action":"tap","params":["out"]}]"""
    val ex = intercept[IllegalStateException] {
      runIr(
        s"""{"action":"dedup-minhash-lsh",
           | "params":[{"id":"doc_id","text":"text","on-excluded":"fail"}],$tap}""".stripMargin,
        adversarial).count()
    }
    assert(ex.getMessage.contains("on-excluded=fail"))
    // clean corpus: auto resolves unlimited, nothing excluded, no throw
    runIr(
      s"""{"action":"dedup-minhash-lsh",
         | "params":[{"id":"doc_id","text":"text","on-excluded":"fail"}],$tap}""".stripMargin,
      clean).count()
    // cluster-split under fail: exclusions happened but the star edges
    // make the result exact — fail must NOT fire on connectivity faces
    val split = runIr(
      s"""{"action":"cluster-split","params":[{"id":"doc_id","text":"text","salt":"cs",
         |   "on-excluded":"fail",
         |   "weights":[{"name":"train","weight":0.8},{"name":"val","weight":0.1},
         |              {"name":"test","weight":0.1}]}],$tap}""".stripMargin,
      adversarial)
    assert(split.count() == adversarial.count())
  }
}
