package graft

import graft.functions.{CountMin, Text}
import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    (1L, "alpha alpha alpha beta beta gamma"),
    (2L, "alpha beta delta delta epsilon"),
    (3L, "alpha zeta zeta zeta zeta eta"),
    (4L, "theta iota kappa alpha beta"))

  private def docsDf = {
    val s = spark; import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  private def exactCounts: Map[String, Long] =
    corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }

  test("JVM md5Hash64 twin is bit-identical to the Column fold") {
    val s = spark; import s.implicits._
    val items = Seq("alpha", "cms:0:alpha", "", "ü-nicode", "42")
    val got = items.toDF("s").select(Text.md5Hash64(col("s")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == items.map(CountMin.md5Hash64))
  }

  test("estimates are overestimate-only and exact when width is ample") {
    val matrix = Sketches.cmsBuildTokens(docsDf, "text", 4, 4096, "cms")
    assert(matrix.length == 4 * 4096 && matrix.sum == 4L * 22) // 22 token instances x depth
    val est = Sketches.cmsTokenCounts(docsDf, "text", 4, 4096, "cms", 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = exactCounts
    assert(est.keySet == exact.keySet)
    for ((t, c) <- exact) assert(est(t) >= c, s"CMS must never undercount: $t")
    // 11 distinct tokens in 4x4096 cells: no pair collides in all 4 rows
    assert(est == exact)
  }

  test("narrow sketch still never undercounts, ranks the heavy hitter first") {
    val top = Sketches.cmsTokenCounts(docsDf, "text", 4, 8, "cms", 3).collect()
    val exact = exactCounts
    assert(top.forall(r => r.getLong(1) >= exact(r.getString(0))))
    assert(top.head.getLong(1) >= 6L) // alpha appears 6 times
  }

  test("sketch is mergeable: per-group sketches sum to the global one") {
    val s = spark; import s.implicits._
    val per = docsDf
      .select((col("doc_id") % 2).as("g"), explode(Text.tokens(col("text"))).as("t"))
      .groupBy("g").agg(CountMin.countMin(col("t"), 2, 64, "m").as("m"))
      .collect().map(_.getSeq[Long](1).toArray)
    val merged = per.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    val global = Sketches.cmsBuildTokens(docsDf, "text", 2, 64, "m")
    assert(merged.toSeq == global.toSeq)
  }

  test("IR action cms-topk declarable") {
    import graft.ir.{Engine, EngineCtx, Node}
    val out = Engine.run(Node.fromJson(
      """{"action":"cms-topk","params":[{"text":"text","depth":4,"width":4096,"seed":"cms","k":2}],
        |"children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("t")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("alpha", 6L), ("beta", 4L)))
  }
}
