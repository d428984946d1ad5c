package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic anisotropic cloud: points along direction (3,1)/√10
    * with var 9 plus orthogonal jitter with var 1, in 4-d (last two dims
    * near-constant). No RNG — fixed trigonometric lattice.
    */
  private def cloud = {
    val s = spark; import s.implicits._
    val u = Array(3.0, 1.0).map(_ / math.sqrt(10.0))
    val w = Array(-1.0, 3.0).map(_ / math.sqrt(10.0))
    (0 until 400).map { i =>
      val a = 3.0 * math.cos(i * 0.7)       // sd 3 along u
      val b = 1.0 * math.sin(i * 1.3)       // sd 1 along w
      (i.toLong, Seq(
        (10.0 + a * u(0) + b * w(0)).toFloat,
        (-5.0 + a * u(1) + b * w(1)).toFloat,
        0.25f, -0.75f))
    }.toDF("vec_id", "embedding")
  }

  test("jacobiEigen: analytic 2x2 and 3x3, sorted desc, sign-fixed") {
    // [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2, (±1,∓1)/√2
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    assert(e2(0).map(x => math.abs(x - 1 / math.sqrt(2))).max < 1e-12)
    assert(math.abs(e2(1)(0) + e2(1)(1)) < 1e-12) // orthogonal, sign-fixed
    // diagonal stays put
    val (v3, e3) = Pca.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(v3.toSeq == Seq(5.0, 3.0, 1.0))
    assert(e3(0).toSeq == Seq(1.0, 0.0, 0.0) && e3(1).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("gramStats: mean and covariance match direct computation") {
    val rows = cloud.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = rows.length
    val mean = Array.tabulate(4)(i => rows.map(_(i)).sum / n)
    val (gn, gMean, gCov) = Pca.gramStats(cloud, "embedding", 4)
    assert(gn == n)
    for (i <- 0 until 4) assert(math.abs(gMean(i) - mean(i)) < 1e-9)
    for (i <- 0 until 4; j <- 0 until 4) {
      val direct = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      assert(math.abs(gCov(i)(j) - direct) < 1e-9, s"cov($i,$j)")
    }
  }

  test("fit recovers the planted principal direction; eigenvalues ordered") {
    val m = Pca.fit(cloud, "embedding", 4, 4)
    val u = Array(3.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(10.0))
    val dot = m.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(math.abs(dot) - 1.0) < 0.05, s"top component misaligned: $dot")
    assert(m.eigVals(0) > m.eigVals(1) && m.eigVals(1) > m.eigVals(2) - 1e-12)
    assert(m.eigVals(2) < 1e-6 && m.eigVals(3) < 1e-6) // constant dims
  }

  test("whiten: retained dims decorrelate to ~unit variance; project centers") {
    val m = Pca.fit(cloud, "embedding", 4, 2)
    val wh = Pca.whiten(cloud, "embedding", "w", m)
    val (_, wMean, wCov) = Pca.gramStats(
      wh.select(col("vec_id"), col("w").cast("array<float>").as("w")), "w", 2)
    assert(wMean.forall(v => math.abs(v) < 1e-4))
    assert(math.abs(wCov(0)(0) - 1.0) < 1e-3 && math.abs(wCov(1)(1) - 1.0) < 1e-3)
    assert(math.abs(wCov(0)(1)) < 1e-3)
    // plain projection: centered but variance = eigenvalue
    val pr = Pca.project(cloud, "embedding", "p", m)
    val (_, pMean, pCov) = Pca.gramStats(
      pr.select(col("vec_id"), col("p").cast("array<float>").as("p")), "p", 2)
    assert(pMean.forall(v => math.abs(v) < 1e-4))
    assert(math.abs(pCov(0)(0) - m.eigVals(0)) < 1e-2)
  }

  test("model round-trip + AffineProject null/short handling") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    val m = Pca.fit(cloud, "embedding", 4, 2)
    Pca.saveModel(spark, m, dir)
    val m2 = Pca.loadModel(spark, dir)
    assert(m2.mean.toSeq == m.mean.toSeq && m2.eigVals.toSeq == m.eigVals.toSeq &&
      m2.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    val before = Pca.whiten(cloud, "embedding", "w", m).select("vec_id", "w")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val after = Pca.whiten(cloud, "embedding", "w", m2).select("vec_id", "w")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(before == after)
    // ragged / null inputs → null output, not a prefix lie
    val bad = Seq((1L, Seq(1.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val out = Pca.project(bad, "embedding", "p", m).select("p").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("IR: pca-train persists + emits components; pca-whiten loads the artifact") {
    import graft.ir.{Engine, EngineCtx, Node}
    val dir = java.nio.file.Files.createTempDirectory("pca_ir").toString + "/m"
    val comp = Engine.run(Node.fromJson(
      s"""{"action":"pca-train","params":[{"vec":"embedding","dim":4,"k":2,"path":"$dir"}],
        |"children":[{"action":"tap","params":["c"]}]}""".stripMargin),
      cloud, EngineCtx(testMode = true)).taps("c")
    assert(comp.columns.toSeq == Seq("component", "eig_val", "row"))
    assert(comp.count() == 2)
    val wh = Engine.run(Node.fromJson(
      s"""{"action":"pca-whiten","params":[{"vec":"embedding","out":"w","model-path":"$dir"}],
        |"children":[{"action":"tap","params":["w"]}]}""".stripMargin),
      cloud, EngineCtx(testMode = true)).taps("w")
    assert(wh.select("w").head.getSeq[Double](0).length == 2)
    // validate stays total on a missing artifact
    val v = Engine.validate(Node.fromJson(
      """{"action":"pca-whiten","params":[{"vec":"embedding","out":"w","model-path":"/nope"}],
        |"children":[{"action":"tap","params":["w"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), cloud.schema)
    assert(v.isEmpty, v.mkString("; "))
  }
}
