package graft

import graft.operators.{Pruning, Similarity, Training}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PruningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic labeled cloud: two lobes around ±(1,1,…) with a
    * trigonometric lattice jitter; label 1 for the positive lobe.
    */
  private def labeled = {
    val s = spark; import s.implicits._
    (0 until 120).map { i =>
      val sgn = if (i % 2 == 0) 1.0 else -1.0
      val vec = (0 until 4).map(d =>
        (sgn + 0.3 * math.cos(i * 0.7 + d)).toFloat)
      (i.toLong, vec, if (sgn > 0) 1 else 0)
    }.toDF("vec_id", "embedding", "y")
  }

  private def brute(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    1.0 - dot / (na * nb)
  }

  test("difficultyScores: el2n in [0,1], grand = el2n * ||[x,1]||, correct on a hand case") {
    val df = labeled
    val model = Training.trainLogisticExact(df, "vec_id", "embedding", "y",
      dim = 4, epochs = 2, lr = 0.5)
    val scored = Pruning.difficultyScores(df, "embedding", "y", model)
      .select("vec_id", "embedding", "y", "el2n", "grand").collect()
    val w = model.collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(scored.length == 120)
    scored.foreach { r =>
      val x = r.getSeq[Float](1)
      val y = r.getInt(2).toDouble
      val z = x.zipWithIndex.map { case (v, i) => v.toDouble * w(i) }.sum + w(4)
      val p = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
      val el2n = r.getDouble(3)
      assert(el2n >= 0.0 && el2n <= 1.0)
      assert(math.abs(el2n - math.abs(p - y)) < 1e-9, s"el2n mismatch at ${r.getLong(0)}")
      val norm = math.sqrt(x.map(v => v.toDouble * v.toDouble).sum + 1.0)
      assert(math.abs(r.getDouble(4) - el2n * norm) < 1e-9, "grand mismatch")
    }
  }

  test("rankBy: 1-based, hardest first, ties to the lower id") {
    val df = labeled
    val model = Training.trainLogisticExact(df, "vec_id", "embedding", "y", 4, 2, 0.5)
    val ranked = Pruning.rankBy(
      Pruning.difficultyScores(df, "embedding", "y", model), "el2n", "vec_id")
      .select("vec_id", "el2n", "rank").collect()
    assert(ranked.map(_.getLong(2)).sorted.toSeq == (1L to 120L))
    val byRank = ranked.sortBy(_.getLong(2))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (ea, eb) = (a.getDouble(1), b.getDouble(1))
      assert(ea > eb || (ea == eb && a.getLong(0) < b.getLong(0)),
        s"rank order broken between ${a.getLong(0)} and ${b.getLong(0)}")
    }
  }

  test("prototypeRanks: rank 1 is the cell argmax; clusterPrune caps per cell on both regimes") {
    val df = labeled
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = 0)
    val ranks = Pruning.prototypeRanks(df, "vec_id", "embedding", cents)
      .select("vec_id", "cell", "cosine", "proto_rank").collect()
    val byCell = ranks.groupBy(_.getLong(1))
    byCell.foreach { case (_, rows) =>
      val best = rows.minBy(r => (-r.getDouble(2), r.getLong(0)))
      assert(best.getInt(3) == 1, "rank 1 must be the (cosine desc, id asc) argmax")
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
    val easy = Pruning.clusterPrune(df, "vec_id", "embedding", cents, perCluster = 3)
      .collect()
    val hard = Pruning.clusterPrune(df, "vec_id", "embedding", cents, perCluster = 3,
      keepHard = true).collect()
    assert(easy.groupBy(_.getLong(1)).values.forall(_.length <= 3))
    assert(hard.groupBy(_.getLong(1)).values.forall(_.length <= 3))
    // regimes pick from opposite ends of the prototypicality order
    byCell.foreach { case (cell, rows) =>
      if (rows.length > 6) {
        val easyIds = easy.filter(_.getLong(1) == cell).map(_.getLong(0)).toSet
        val hardIds = hard.filter(_.getLong(1) == cell).map(_.getLong(0)).toSet
        assert(easyIds.intersect(hardIds).isEmpty,
          s"cell $cell: easy and hard picks overlap")
        val sortedDesc = rows.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0))
        assert(easyIds == sortedDesc.take(3).toSet)
        assert(hardIds == sortedDesc.reverse.take(3).map(identity).toSet ||
          hardIds == rows.sortBy(r => (r.getDouble(2), r.getLong(0))).take(3).map(_.getLong(0)).toSet)
      }
    }
  }

  test("kcenterGreedy: seed is min id; every pick is the brute-force argmax; radius non-increasing") {
    val df = labeled
    val k = 6
    val picks = Pruning.kcenterGreedy(df, "vec_id", "embedding", k)
      .orderBy("pick").collect()
    assert(picks.length == k)
    assert(picks(0).getLong(1) == 0L && picks(0).isNullAt(2))
    // independent brute-force replay of the greedy selection
    val pts = labeled.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    var centers = Vector(pts(0)._2)
    for (t <- 2 to k) {
      val (bestId, bestD) = pts.map { case (id, v) =>
        (id, centers.map(c => brute(v, c)).min)
      }.maxBy { case (id, d) => (d, -id) }
      val row = picks(t - 1)
      assert(row.getLong(1) == bestId, s"pick $t: expected $bestId got ${row.getLong(1)}")
      assert(math.abs(row.getDouble(2) - bestD) < 1e-9, s"pick $t radius")
      centers = centers :+ pts.find(_._1 == bestId).get._2
    }
    val radii = picks.drop(1).map(_.getDouble(2))
    radii.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12,
      "covering radius must be non-increasing") }
  }

  test("cartography: trace last epoch == final model; stats match a hand replay; region law") {
    val df = labeled
    val (dim, epochs, lr) = (4, 3, 0.5)
    val trace = Training.trainLogisticExactTrace(df, "vec_id", "embedding", "y", dim, epochs, lr)
    // last epoch of the trace IS the final model
    val last = trace.filter(col("epoch") === epochs).select("dim", "weight")
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val fin = Training.trainLogisticExact(df, "vec_id", "embedding", "y", dim, epochs, lr)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(last.toSeq == fin.toSeq, "trace last epoch must equal the final model bit-for-bit")
    val byEpoch = trace.collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getDouble(2)))
    assert(byEpoch.length == epochs)
    val out = Pruning.cartography(df, "embedding", "y", trace)
      .select("vec_id", "embedding", "y", "confidence", "variability", "correct_frac", "region")
      .collect()
    assert(out.length == 120)
    out.foreach { r =>
      val x = r.getSeq[Float](1); val y = r.getInt(2).toDouble
      val gold = byEpoch.map { w =>
        val z = x.zipWithIndex.map { case (v, i) => v.toDouble * w(i) }.sum + w(4)
        val p = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
        if (y == 1.0) p else 1.0 - p
      }
      val conf = gold.sum / epochs
      val varb = math.sqrt(gold.map(g => (g - conf) * (g - conf)).sum / epochs)
      assert(math.abs(r.getDouble(3) - conf) < 1e-9, s"confidence at ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - varb) < 1e-9, s"variability at ${r.getLong(0)}")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      val region = r.getString(6)
      if (conf >= 0.7 && varb <= 0.2) assert(region == "easy")
      else if (conf <= 0.3 && varb <= 0.2) assert(region == "hard")
      else assert(region == "ambiguous")
    }
    // the separable lobes are learned: most examples land in 'easy'
    assert(out.count(_.getString(6) == "easy") > 60)
  }

  test("IR actions: el2n-scores / prototype-ranks / cluster-prune / kcenter-coreset run and validate total") {
    import graft.ir.{Engine, EngineCtx, Node}
    val df = labeled
    val tmp = java.nio.file.Files.createTempDirectory("pruning_ir")
    val modelPath = tmp.resolve("model").toString
    val centsPath = tmp.resolve("cents").toString
    Training.saveModel(
      Training.trainLogisticExact(df, "vec_id", "embedding", "y", 4, 2, 0.5), modelPath)
    Similarity.saveCentroids(
      Similarity.kmeansCentroids(df, "vec_id", "embedding", 4, iters = 0), centsPath, spark)
    def run(json: String) =
      Engine.run(Node.fromJson(json), df, EngineCtx(testMode = true)).taps("t")
    val el2n = run(
      s"""{"action":"el2n-scores","params":[{"vec":"embedding","label":"y","model-path":"$modelPath"}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin).collect()
    assert(el2n.length == 120 &&
      el2n.forall(r => r.getDouble(r.fieldIndex("el2n")) >= 0.0))
    val ranks = run(
      s"""{"action":"prototype-ranks","params":[{"id":"vec_id","vec":"embedding","centroids-path":"$centsPath"}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin).collect()
    assert(ranks.length == 120 && ranks.exists(_.getInt(3) == 1))
    val pruned = run(
      s"""{"action":"cluster-prune","params":[{"id":"vec_id","vec":"embedding",
         | "centroids-path":"$centsPath","per-cluster":2,"keep-hard":true}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin).collect()
    assert(pruned.nonEmpty && pruned.groupBy(_.getLong(1)).values.forall(_.length <= 2))
    val core = run(
      s"""{"action":"kcenter-coreset","params":[{"id":"vec_id","vec":"embedding","k":3}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin).collect()
    assert(core.length == 3 && core.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // cartography by trace artifact
    val tracePath = tmp.resolve("trace").toString
    Training.trainLogisticExactTrace(df, "vec_id", "embedding", "y", 4, 2, 0.5)
      .write.parquet(tracePath)
    val carto = run(
      s"""{"action":"cartography","params":[{"vec":"embedding","label":"y","trace-path":"$tracePath"}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin).collect()
    assert(carto.length == 120 &&
      carto.forall(r => Set("easy", "hard", "ambiguous")(r.getString(r.fieldIndex("region")))))
    // validate stays total without reading any artifact
    for ((a, ps) <- Seq(
      "cartography" -> """{"vec":"embedding","label":"y","trace-path":"/nope"}""",
      "el2n-scores" -> """{"vec":"embedding","label":"y","model-path":"/nope"}""",
      "prototype-ranks" -> """{"id":"vec_id","vec":"embedding","centroids-path":"/nope"}""",
      "cluster-prune" -> """{"id":"vec_id","vec":"embedding","centroids-path":"/nope","per-cluster":2}""",
      "kcenter-coreset" -> """{"id":"vec_id","vec":"embedding","k":3}""")) {
      val v = Engine.validate(Node.fromJson(
        s"""{"action":"$a","params":[$ps],
           | "children":[{"action":"tap","params":["t"]}]}""".stripMargin),
        spark, EngineCtx(testMode = true), df.schema)
      assert(v.isEmpty, s"$a: ${v.mkString("; ")}")
    }
    // bad knobs fail loudly at validate time
    val bad = Engine.validate(Node.fromJson(
      s"""{"action":"cluster-prune","params":[{"id":"vec_id","vec":"embedding",
         | "centroids-path":"/nope","per-cluster":0}],
         | "children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), df.schema)
    assert(bad.nonEmpty)
  }

  test("kcenterGreedy: duplicate ids collapse; k larger than distinct points re-covers without failing") {
    val s = spark; import s.implicits._
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val picks = Pruning.kcenterGreedy(tiny, "vec_id", "embedding", k = 5)
      .orderBy("pick").collect()
    assert(picks.length == 5)
    assert(picks(0).getLong(1) == 1L)
    // the three distinct locations are all covered within the first 3 picks
    assert(picks.take(3).map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // once covered, further picks close ~zero radius
    assert(picks.drop(3).forall(_.getDouble(2) < 1e-6))
  }
}
