package graft

import graft.functions.MisraGriesAgg
import graft.operators.Sketches
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitter laws, buffer-level (no Spark job) and
  * end-to-end. The load-bearing claims: est <= true with error bounded
  * by n/(k+1); every item with count > n/(k+1) survives ANY chunking and
  * merge order of the stream (the mergeable-summaries guarantee Spark's
  * partial aggregation relies on); and the two-pass heavyHitters output
  * is deterministic across partitionings even though the sketch's
  * sub-threshold margin is not.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def agg(k: Int) = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)

  /** Run a stream through one buffer. */
  private def sketch(k: Int, items: Seq[String]): collection.Map[String, Long] = {
    val a = agg(k)
    val b = a.createAggregationBuffer()
    items.foreach(s => a.update(b, InternalRow(UTF8String.fromString(s))))
    b
  }

  private def bounds(k: Int, stream: Seq[String],
                     got: collection.Map[String, Long]): Unit = {
    val n = stream.size
    val exact = stream.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    assert(got.size <= k, "buffer must never exceed k counters")
    for ((item, est) <- got) {
      assert(est <= exact(item), s"$item: est $est > true ${exact(item)}")
      assert((exact(item) - est).toDouble <= n.toDouble / (k + 1),
        s"$item: error ${exact(item) - est} > n/(k+1)")
    }
    for ((item, c) <- exact if c > n.toLong / (k + 1))
      assert(got.contains(item), s"heavy item $item (count $c, n=$n) evicted")
  }

  test("single-buffer law: underestimate-only, n/(k+1) error, heavy items survive") {
    val rnd = new scala.util.Random(7)
    // zipfish: item i appears ~ 200/i times over a 50-item universe
    val stream = rnd.shuffle(
      (1 to 50).flatMap(i => Seq.fill(200 / i)(s"tok$i")).toVector)
    for (k <- Seq(1, 3, 8, 20)) bounds(k, stream, sketch(k, stream))
  }

  test("mergeable: bounds + completeness hold for every chunking and merge order") {
    val rnd = new scala.util.Random(13)
    val stream = rnd.shuffle(
      (1 to 30).flatMap(i => Seq.fill(120 / i)(s"w$i")).toVector)
    val k = 6
    val a = agg(k)
    for (nChunks <- Seq(2, 3, 5, 8); trial <- 0 until 3) {
      val chunks = stream.grouped(math.max(1, stream.size / nChunks)).toVector
      val bufs = chunks.map { c =>
        val b = a.createAggregationBuffer()
        c.foreach(s => a.update(b, InternalRow(UTF8String.fromString(s))))
        b
      }
      // merge in a random order (left fold over a shuffled sequence AND a
      // random tree) — the invariants must be order-independent
      val shuffled = new scala.util.Random(trial).shuffle(bufs)
      val folded = shuffled.map(cloneBuf).reduceLeft(a.merge)
      bounds(k, stream, folded)
      val treed = treeMerge(a, shuffled.map(cloneBuf))
      bounds(k, stream, treed)
    }
  }

  private def cloneBuf(b: scala.collection.mutable.HashMap[String, Long]) =
    b.clone()

  private def treeMerge(a: MisraGriesAgg,
                        bs: Seq[scala.collection.mutable.HashMap[String, Long]]): scala.collection.mutable.HashMap[String, Long] =
    if (bs.size == 1) bs.head
    else treeMerge(a, bs.grouped(2).map {
      case Seq(x, y) => a.merge(x, y)
      case Seq(x)    => x
    }.toSeq)

  test("serialize round-trips the buffer exactly (incl. unicode items)") {
    val a = agg(4)
    val b = sketch(4, Seq("α", "α", "β", "", "界", "界", "界"))
    val back = a.deserialize(a.serialize(
      b.asInstanceOf[scala.collection.mutable.HashMap[String, Long]]))
    assert(back == b)
  }

  test("heavyHitters: exact counts above threshold, deterministic across partitionings") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha alpha alpha alpha beta beta gamma delta"),
      (2L, "alpha alpha beta beta epsilon zeta eta theta"),
      (3L, "alpha beta iota kappa lambda mu nu xi"))
    val df = corpus.toDF("doc_id", "text")
    // n = 24 tokens; k=3 → threshold 24/4 = 6: alpha(7) passes, beta(5) not
    val expect = Seq(("alpha", 7L))
    for (parts <- Seq(1, 7, 32)) {
      val got = Sketches.heavyHitters(df.repartition(parts), "text", 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"parts=$parts")
    }
    // ample counters: every token above the lowered threshold, exact
    val k20 = Sketches.heavyHitters(df, "text", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(k20 == Seq(("alpha", 7L), ("beta", 5L))) // 24/21 → cnt*21 > 24 ⇔ cnt >= 2
  }

  test("IR action heavy-hitters declarable") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark; import s.implicits._
    val df = Seq((1L, "a a a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Engine.run(Node.fromJson(
      """{"action":"heavy-hitters","params":[{"text":"text","k":2}],
        |"children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("t")
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L))) // n=8, k=2: cnt*3 > 8 ⇔ cnt >= 3
  }
}
