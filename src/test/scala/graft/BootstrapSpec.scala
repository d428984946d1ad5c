package graft

import graft.functions.CountMin
import graft.operators.Bootstrap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Poisson-bootstrap pinned three ways: replicate means equal an
  * independent local resampling reference (same hash convention, plain
  * Scala arithmetic), the weights behave like Poisson(1) in aggregate
  * (mean ~1, var ~1 — a wrong CDF table or hash scaling breaks this
  * loudly), and the CI obeys the obvious laws (constant column gives a
  * width-0 interval at the constant; interval brackets the point
  * estimate; more data tightens it).
  */
class BootstrapSpec extends AnyFunSuite {
  import TestSpark.spark

  private def refWeight(salt: String, rep: Int, id: Long): Int = {
    val u = CountMin.md5Hash64(s"$salt:$rep:$id").toDouble / 1152921504606846976.0
    Bootstrap.PoissonCdf.count(c => u >= c.toDouble)
  }

  test("replicateMeans == an independent local Poisson-resample reference") {
    val s = spark
    import s.implicits._
    val rows = (0 until 80).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", (i * 7 % 23) + 1))
    val df = rows.toDF("id", "grp", "v")
    val r = 20
    val got = Bootstrap.replicateMeans(df, "v", "id", Seq("grp"), r, salt = "t")
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val want = (for {
      grp <- Seq("a", "b"); rep <- 0 until r
      members = rows.filter(_._2 == grp)
      ws = members.map { case (id, _, v) => (refWeight("t", rep, id), v) }
      wn = ws.map(_._1).sum if wn > 0
    } yield (grp, rep.toLong) ->
      ws.map { case (w, v) => w.toDouble * v }.sum / wn).toMap
    assert(got.keySet == want.keySet, s"replicate keys differ: ${got.size} vs ${want.size}")
    want.foreach { case (k, m) =>
      assert(math.abs(got(k) - m) < 1e-9, s"mean mismatch at $k: ${got(k)} vs $m") }
  }

  test("weights are Poisson(1)-like in aggregate: mean ~1, variance ~1") {
    val draws = for (rep <- 0 until 50; id <- 0L until 200L)
      yield refWeight("agg", rep, id).toDouble
    val n = draws.size
    val mean = draws.sum / n
    val varc = draws.map(d => (d - mean) * (d - mean)).sum / n
    assert(math.abs(mean - 1.0) < 0.05, s"weight mean $mean")
    assert(math.abs(varc - 1.0) < 0.1, s"weight variance $varc")
  }

  test("CI laws: constant metric collapses the interval; interval brackets the point; width shrinks with n") {
    val s = spark
    import s.implicits._
    val const = (0 until 60).map(i => (i.toLong, "c", 42)).toDF("id", "grp", "v")
    val ci0 = Bootstrap.confidenceInterval(const, "v", "id", Seq("grp"), r = 30, alpha = 0.1)
      .collect().head
    assert(ci0.getDouble(2) == 42.0 && ci0.getDouble(3) == 42.0 && ci0.getDouble(4) == 42.0,
      s"constant column: point/lo/hi must all be 42, got $ci0")
    // same distribution, two sizes: small group's interval is wider
    val mixed = ((0 until 50).map(i => (i.toLong, "small", (i * 13 % 101))) ++
      (1000 until 1800).map(i => (i.toLong, "big", (i * 13 % 101))))
      .toDF("id", "grp", "v")
    val cis = Bootstrap.confidenceInterval(mixed, "v", "id", Seq("grp"), r = 60, alpha = 0.1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    cis.foreach { case (g, (_, point, lo, hi)) =>
      assert(lo <= hi, s"$g: lo > hi")
      assert(point >= lo - 5 && point <= hi + 5, s"$g: point $point far outside [$lo,$hi]") }
    val widthSmall = cis("small")._4 - cis("small")._3
    val widthBig = cis("big")._4 - cis("big")._3
    assert(widthBig < widthSmall,
      s"16x data must tighten the interval: big=$widthBig small=$widthSmall")
  }

  test("CI is total for tiny groups where replicates sample zero rows") {
    // n=2 per group, r=200: each replicate is empty with prob e^-2, so
    // ~27 of the 200 means are ABSENT per group — quantile indices keyed
    // to r (not the present count) would read past the collected list
    // and throw under ANSI; the law here is simply totality + sane bounds
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 5.0), ("b", 4L, 15.0))
      .toDF("grp", "id", "v")
    val out = Bootstrap.confidenceInterval(df, "v", "id", Seq("grp"), r = 200, alpha = 0.1)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("a", "b"))
    out.foreach { case (g, (lo, hi)) => assert(lo <= hi, s"$g: lo $lo > hi $hi") }
    // bounds live inside the value range: a replicate mean is a convex
    // combination of the group's values
    assert(out("a")._1 >= 10.0 && out("a")._2 <= 20.0)
    assert(out("b")._1 >= 5.0 && out("b")._2 <= 15.0)
  }
}
