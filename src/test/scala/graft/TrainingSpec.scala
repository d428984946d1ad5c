package graft

import graft.operators.Training
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed classifier training: the full-batch GD loop must learn a
  * separable problem, the oracle-exact and production gradients must
  * agree to float-reduction tolerance, and the exact path must be
  * bit-deterministic across runs (it feeds a hash gate).
  */
class TrainingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // linearly separable toy set: y = 1 iff x0 > 0, 40 points on ±1 with
  // a little deterministic jitter in the other dims
  private def toy(dim: Int = 4, n: Int = 40) = {
    val rng = new scala.util.Random(11)
    (0 until n).map { i =>
      val y = i % 2
      val x0 = if (y == 1) 1.0f else -1.0f
      val rest = Seq.fill(dim - 1)(rng.nextFloat() * 0.2f - 0.1f)
      (i.toLong, x0 +: rest, y)
    }.toDF("id", "vec", "y")
  }

  private def accuracy(scored: Seq[(Int, Double)]): Double =
    scored.count { case (y, p) => (p >= 0.5) == (y == 1) }.toDouble / scored.size

  test("trainLogistic learns a separable problem (accuracy 1.0, weight on the signal dim)") {
    val df = toy()
    val model = Training.trainLogistic(df, "id", "vec", "y", dim = 4, epochs = 10, lr = 1.0)
    val w = model.orderBy("dim").collect().map(_.getDouble(1))
    assert(w(0) > 0.3, s"signal weight should dominate, got ${w.toSeq}")
    assert(math.abs(w(1)) < w(0) && math.abs(w(2)) < w(0) && math.abs(w(3)) < w(0))
    val scored = Training.scoreLogistic(df, "vec", model, "p")
      .select("y", "p").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(accuracy(scored) == 1.0)
  }

  test("training loss decreases epoch over epoch") {
    val df = toy()
    def loss(epochs: Int): Double = {
      val m = Training.trainLogistic(df, "id", "vec", "y", dim = 4, epochs = epochs, lr = 1.0)
      Training.scoreLogistic(df, "vec", m, "p")
        .select(avg(-(col("y") * log(col("p")) + (lit(1) - col("y")) * log(lit(1.0) - col("p")))))
        .collect().head.getDouble(0)
    }
    val losses = Seq(1, 3, 6, 10).map(loss)
    assert(losses == losses.sorted.reverse, s"losses should be non-increasing: $losses")
  }

  test("exact and production trainers agree to reduction tolerance") {
    val df = toy()
    val we = Training.trainLogisticExact(df, "id", "vec", "y", 4, 5, 1.0)
      .orderBy("dim").collect().map(_.getDouble(1))
    val wf = Training.trainLogistic(df, "id", "vec", "y", 4, 5, 1.0)
      .orderBy("dim").collect().map(_.getDouble(1))
    we.zip(wf).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"exact $a vs fast $b")
    }
  }

  test("exact trainer is bit-deterministic across runs") {
    val df = toy(dim = 6, n = 60)
    def run() = Training.trainLogisticExact(df, "id", "vec", "y", 6, 3, 0.5)
      .orderBy("dim").collect().map(_.getDouble(1)).toSeq
    assert(run() == run())
  }

  test("saveModel/loadModel round-trips bit-exactly; evaluateLogistic counts the confusion") {
    val df = toy()
    val model = Training.trainLogistic(df, "id", "vec", "y", 4, 10, 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    Training.saveModel(model, s"$dir/m")
    val loaded = Training.loadModel(spark, s"$dir/m")
    assert(loaded.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      model.orderBy("dim").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq)
    val ev = Training.evaluateLogistic(df, "vec", "y", loaded).collect().head
    val (tp, fp, tn, fn) = (ev.getLong(0), ev.getLong(1), ev.getLong(2), ev.getLong(3))
    assert(tp + fp + tn + fn == 40)
    assert(ev.getDouble(4) == (tp + tn).toDouble / 40)
    assert(ev.getDouble(4) == 1.0) // separable problem, 10 epochs
  }

  test("empty frame, null labels, and null vector ELEMENTS all fail loudly") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Seq[Float], Int)].toDF("id", "vec", "y")
    assert(intercept[Exception] {
      Training.trainLogistic(empty, "id", "vec", "y", 2, 1, 0.5)
    }.getMessage.contains("empty training frame"))
    val nullLabel = Seq((1L, Seq(1.0f, 2.0f), Some(1)), (2L, Seq(1.0f, 2.0f), None))
      .toDF("id", "vec", "y")
    assert(intercept[Exception] {
      Training.trainLogistic(nullLabel, "id", "vec", "y", 2, 1, 0.5)
    }.getMessage.contains("null y"))
    val nullElem = Seq((1L, Seq(Some(1.0f), None), 1), (2L, Seq(Some(1.0f), Some(2.0f)), 0))
      .toDF("id", "vec", "y")
    assert(intercept[Exception] {
      Training.trainLogistic(nullElem, "id", "vec", "y", 2, 1, 0.5)
    }.getMessage.contains("null elements"))
  }

  test("loadWeightsCached picks up an in-place saveModel rewrite (fingerprint revalidation)") {
    val df = toy()
    val dir = java.nio.file.Files.createTempDirectory("graft-model2").toString + "/m"
    val m1 = Training.trainLogistic(df, "id", "vec", "y", 4, 2, 1.0)
    Training.saveModel(m1, dir)
    val w1 = Training.loadWeightsCached(spark, dir).toSeq
    val m2 = Training.trainLogistic(df, "id", "vec", "y", 4, 10, 1.0)
    Training.saveModel(m2, dir) // overwrite in place
    val w2 = Training.loadWeightsCached(spark, dir).toSeq
    assert(w1 != w2, "cache served stale weights after an in-place rewrite")
    assert(w2 == m2.orderBy("dim").collect().map(_.getDouble(1)).toSeq)
  }

  test("a vector longer than the declared dim fails with the cause, not an index error") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f), 1), (2L, Seq(1.0f, 2.0f, 3.0f), 0))
      .toDF("id", "vec", "y")
    val e = intercept[Exception] {
      Training.trainLogistic(df, "id", "vec", "y", dim = 2, epochs = 1, lr = 0.5)
    }
    assert(e.getMessage.contains("longer than the declared dim"))
  }

  test("fused MarginDot == unrolled element_at chain, bit for bit; short vector fails with dim") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31)
    val w = Array.fill(9)(rng.nextDouble() * 2 - 1) // d=8 + bias
    val rows = (1L to 100L).map(i => (i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
    val unrolled = (w.indices.init.map(i =>
      element_at(col("vec"), i + 1).cast("double") * lit(w(i))) :+ lit(w.last))
      .reduceLeft(_ + _)
    val both = rows.toDF("id", "vec")
      .withColumn("fused", graft.functions.VectorExpressions.marginDot(col("vec"), w))
      .withColumn("ref", unrolled)
      .select("fused", "ref").collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // array<double> input works too (the IR score-logistic path):
    // 0.5*2 + (-0.5)*4 + bias 1 = 0.0
    val d = Seq((1L, Seq(0.5, -0.5))).toDF("id", "vec")
      .select(graft.functions.VectorExpressions.marginDot(col("vec"), Array(2.0, 4.0, 1.0)))
      .collect().head.getDouble(0)
    assert(d == 0.0)
  }

  test("scoring survives a model dimension far past the Janino unroll limit") {
    val s = spark
    import s.implicits._
    val dim = 1500 // the unrolled chain at this dim overflows 64 KB codegen
    val rng = new scala.util.Random(47)
    val w = Array.fill(dim + 1)(rng.nextDouble() * 0.01)
    val df = Seq((1L, Seq.fill(dim)(rng.nextFloat())), (2L, Seq.fill(dim)(rng.nextFloat())))
      .toDF("id", "vec")
    val scored = Training.scoreWithWeights(df, "vec", w, "p").select("p").collect()
    assert(scored.length == 2 && scored.forall(r => r.getDouble(0) > 0 && r.getDouble(0) < 1))
    // a short vector names the model dim in the failure
    val bad = Seq((3L, Seq.fill(dim - 1)(0.1f))).toDF("id", "vec")
    val e = intercept[Exception](Training.scoreWithWeights(bad, "vec", w, "p").collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains(s"model dim is $dim")))))
  }

  test("scoreLogistic output stays in (0, 1) and is monotone in the margin") {
    val df = toy()
    val model = Training.trainLogistic(df, "id", "vec", "y", 4, 5, 1.0)
    val ps = Training.scoreLogistic(df, "vec", model, "p")
      .select("p").collect().map(_.getDouble(0))
    assert(ps.forall(p => p > 0.0 && p < 1.0))
  }

  test("preferencePairs: argmax/argmin per group, deterministic ties, margin filter, degenerate groups drop") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // group 1: clear winner/loser + a middle row
      (1L, 10L, 0.9), (1L, 11L, 0.1), (1L, 12L, 0.5),
      // group 2: TIES at both extremes -> lowest id on each side
      (2L, 23L, 0.8), (2L, 21L, 0.8), (2L, 24L, 0.2), (2L, 22L, 0.2),
      // group 3: gap below the margin
      (3L, 30L, 0.55), (3L, 31L, 0.50),
      // group 4: singleton; group 5: all-tied
      (4L, 40L, 0.99), (5L, 50L, 0.5), (5L, 51L, 0.5)
    ).toDF("grp", "resp", "score")
    val out = Training.preferencePairs(df, "grp", "resp", "score", minGap = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSet
    assert(out == Set(
      (1L, 10L, 11L, 0.8),
      (2L, 21L, 22L, 0.6000000000000001)), s"pairs: $out")
    // null scores are ignored; a group that is all-null emits nothing
    val withNulls = df.unionByName(
      Seq((6L, 60L, Option.empty[Double]), (6L, 61L, Option.empty[Double]))
        .toDF("grp", "resp", "score"))
    assert(Training.preferencePairs(withNulls, "grp", "resp", "score", minGap = 0.3)
      .count() == 2)
    // IR face
    import graft.ir.{Engine, EngineCtx, Node}
    val ir = Engine.run(Node.fromJson(
      """{"action":"preference-pairs",
        | "params":[{"group":"grp","id":"resp","score":"score","min-gap":0.3}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSet
    assert(ir == out)

    // bestOfN: the argmax face — whole row survives, ties to lower id,
    // all-null groups emit nothing
    val best = Training.bestOfN(withNulls, "grp", "resp", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best == Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L, 5L -> 50L),
      s"best rows: $best")
    val irBest = Engine.run(Node.fromJson(
      """{"action":"best-of-n",
        | "params":[{"group":"grp","id":"resp","score":"score"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      withNulls, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(irBest == best)
  }
}
