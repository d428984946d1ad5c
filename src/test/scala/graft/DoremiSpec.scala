package graft

import graft.operators.Doremi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DoReMi-style domain reweighting laws: clipped excess, the
  * multiplicative-weights loop vs an independent in-memory reference,
  * smoothing/rounds behavior, and the resample face. The one-round
  * weights and the resample copy rule are oracle-gated
  * (`doremi_weights` / `doremi_reweight`).
  */
class DoremiSpec extends AnyFunSuite {
  import TestSpark.spark

  // three domains with per-doc loss fixed per domain: a=2.0, b=1.0, c=0.2
  // against ref 0.5 -> excess a=1.5, b=0.5, c=0.0 (clipped)
  private def corpus() = {
    val s = spark
    import s.implicits._
    val rows =
      (1 to 40).map(i => (i.toLong, "a", 2.0)) ++
      (41 to 60).map(i => (i.toLong, "b", 1.0)) ++
      (61 to 100).map(i => (i.toLong, "c", 0.2))
    rows.toDF("id", "dom", "loss")
  }

  // independent reference: normalized-iterate MW with averaging
  private def refWeights(excess: Seq[Double], eta: Double, rounds: Int,
                         smoothing: Double): Seq[Double] = {
    val d = excess.length
    var alpha = Seq.fill(d)(1.0 / d)
    var first = true
    val sums = Array.fill(d)(0.0)
    for (_ <- 1 to rounds) {
      val u = if (first) excess.map(e => StrictMath.exp(eta * e))
              else alpha.zip(excess).map { case (a, e) => a * StrictMath.exp(eta * e) }
      first = false
      val z = u.foldLeft(0.0)(_ + _)
      alpha = u.map(_ / z)
      if (smoothing > 0)
        alpha = alpha.map(a => (1 - smoothing) * a + smoothing / d)
      for (i <- 0 until d) sums(i) += alpha(i)
    }
    sums.map(_ / rounds).toSeq
  }

  test("domainExcess: exact decimal mean, clipped at zero") {
    val got = Doremi.domainExcess(corpus(), "dom", col("loss"), lit(0.5))
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 40L, 1.5), ("b", 20L, 0.5), ("c", 40L, 0.0)))
  }

  test("one-round weights: monotone in excess, sum ~ 1") {
    val w = Doremi.weights(corpus(), "dom", col("loss"), lit(0.5))
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(w("a") > w("b") && w("b") > w("c") && w("c") > 0.0)
    assert(math.abs(w.values.sum - 1.0) < 1e-5) // decimal(38,6) readout
    val want = refWeights(Seq(1.5, 0.5, 0.0), 1.0, 1, 0.0)
    assert(math.abs(w("a") - want(0)) < 1e-6 && math.abs(w("c") - want(2)) < 1e-6)
  }

  test("multi-round loop matches the independent reference; rounds concentrate") {
    for ((rounds, smoothing) <- Seq((3, 0.0), (5, 0.2), (10, 0.0))) {
      val got = Doremi.weights(corpus(), "dom", col("loss"), lit(0.5),
          eta = 0.7, rounds = rounds, smoothing = smoothing)
        .orderBy("domain").collect().map(_.getDouble(3)).toSeq
      val want = refWeights(Seq(1.5, 0.5, 0.0), 0.7, rounds, smoothing)
      got.zip(want).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-6, s"rounds=$rounds s=$smoothing: $got vs $want")
      }
    }
    // averaged-over-iterates weight of the max-excess domain grows with rounds
    def top(r: Int) = Doremi.weights(corpus(), "dom", col("loss"), lit(0.5), rounds = r)
      .filter(col("domain") === "a").head().getDouble(3)
    assert(top(5) > top(1))
  }

  test("zero excess everywhere -> uniform; full smoothing bound respected") {
    val w = Doremi.weights(corpus(), "dom", col("loss"), lit(99.0))
      .collect().map(_.getDouble(3))
    w.foreach(x => assert(math.abs(x - 1.0 / 3) < 1e-5))
    // smoothing pulls toward uniform vs the unsmoothed mixture
    def spread(s: Double) = {
      val ws = Doremi.weights(corpus(), "dom", col("loss"), lit(0.5),
        rounds = 2, smoothing = s).collect().map(_.getDouble(3))
      ws.max - ws.min
    }
    assert(spread(0.5) < spread(0.0))
    intercept[IllegalArgumentException] {
      Doremi.weights(corpus(), "dom", col("loss"), lit(0.5), smoothing = 1.0)
    }
  }

  test("reweight: deterministic copy rule, output mass tracks the weights") {
    val out = Doremi.reweight(corpus(), "dom", "id", col("loss"), lit(0.5))
    val a = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    val b = Doremi.reweight(corpus(), "dom", "id", col("loss"), lit(0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(a == b && a.nonEmpty)
    val byDom = a.groupBy(_._2).view.mapValues(_.size).toMap
    // domain a (excess 1.5, 40 docs) must end up with more mass than its
    // input share; c (excess 0, 40 docs) with less
    assert(byDom("a") > 40 && byDom.getOrElse("c", 0) < 40)
    // total output size ~ input size (weights sum to 1)
    assert(math.abs(a.size - 100) <= 15)
  }

  test("doremi-weights / doremi-reweight are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    def run(json: String) =
      Engine.run(Node.fromJson(json), corpus(), EngineCtx(testMode = true)).taps("out")
    val w = run(
      """{"action":"doremi-weights","params":[{"domain":"dom","loss":"loss","ref":0.5,"rounds":2}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    assert(w.columns.toSeq == Seq("domain", "n", "excess", "weight") && w.count() == 3L)
    val r = run(
      """{"action":"doremi-reweight","params":[{"domain":"dom","id":"id","loss":"loss","ref":0.5}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    assert(r.columns.contains("copy") && r.count() > 0L)
    // static validation accepts both without launching jobs
    val v = Engine.validate(Node.fromJson(
      """{"action":"doremi-weights","params":[{"domain":"dom","loss":"loss","ref":0.5}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      spark, schema = corpus().schema)
    assert(v.isEmpty, v.mkString("; "))
  }
}
