package graft

import graft.functions.{CountMin, Hll, HllAgg}
import graft.operators.Sketches
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog laws: register arithmetic against an independent
  * recomputation from the hash, exact partition/merge-order invariance
  * (element-wise max), the FFGM07 error bound on a large synthetic set,
  * and the fixed-memory buffer.
  */
class HllSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def agg(b: Int) = HllAgg(BoundReference(0, StringType, nullable = true), b, "hll")

  private def sketch(b: Int, items: Seq[String]): Array[Byte] = {
    val a = agg(b)
    val buf = a.createAggregationBuffer()
    items.foreach(s => a.update(buf, InternalRow(UTF8String.fromString(s))))
    buf
  }

  /** Independent register computation: string bit-walk over the binary
    * expansion instead of numberOfLeadingZeros.
    */
  private def refRegister(b: Int, item: String): (Int, Int) = {
    val h = CountMin.md5Hash64("hll:" + item)
    val w = 60 - b
    val bits = (0 until 60).map(i => (h >>> (59 - i)) & 1L)
    val idx = bits.take(b).foldLeft(0L)((a, x) => a * 2 + x).toInt
    val suffix = bits.drop(b)
    val rank = suffix.indexWhere(_ == 1L) match {
      case -1 => w + 1
      case i  => i + 1
    }
    (idx, rank)
  }

  test("update: register index and rank match the independent bit-walk") {
    val a = agg(8)
    for (item <- Seq("alpha", "beta", "", "ü", "the", "42", "xyzzy")) {
      val buf = a.createAggregationBuffer()
      a.update(buf, InternalRow(UTF8String.fromString(item)))
      val (idx, rank) = refRegister(8, item)
      assert((buf(idx) & 0xFF) == rank, item)
      assert(buf.count(_ != 0) == 1, item)
    }
  }

  test("registers are EXACTLY partition- and merge-order-invariant") {
    val rnd = new scala.util.Random(3)
    val items = Vector.fill(5000)("item" + rnd.nextInt(800))
    val whole = sketch(10, items)
    val a = agg(10)
    for (chunks <- Seq(2, 7, 32)) {
      val bufs = items.grouped(math.max(1, items.size / chunks))
        .map(c => sketch(10, c)).toVector
      val merged = new scala.util.Random(chunks).shuffle(bufs)
        .foldLeft(a.createAggregationBuffer())(a.merge)
      assert(merged.toSeq == whole.toSeq, s"chunks=$chunks")
    }
  }

  test("estimate: within 3 standard errors on 100k distinct, linear counting on tiny sets") {
    val b = 10
    val m = 1 << b
    val n = 100000
    val items = (0 until n).map(i => s"tok$i")
    val regs = sketch(b, items).map(_ & 0xFF)
    val est = Hll.estimate(regs, b)
    val stderr = 1.04 / math.sqrt(m)
    assert(math.abs(est - n) / n < 3 * stderr,
      s"est $est vs $n (rel ${math.abs(est - n) / n})")
    // small range: 40 distinct over 1024 registers → linear counting, near-exact
    val small = Hll.estimate(sketch(b, (0 until 40).map("s" + _)).map(_ & 0xFF), b)
    assert(math.abs(small - 40) < 3, s"linear-counting estimate $small vs 40")
    // duplicates never move the estimate (idempotent updates)
    val dup = Hll.estimate(sketch(b, items ++ items).map(_ & 0xFF), b)
    assert(dup == est)
  }

  test("buffer stays 2^b bytes regardless of cardinality; serde round-trips") {
    val a = agg(6)
    val buf = sketch(6, (0 until 50000).map("x" + _))
    assert(buf.length == 64)
    assert(a.deserialize(a.serialize(buf)).toSeq == buf.toSeq)
  }

  test("hllRegisters operator: nonzero registers only, deterministic across partitionings") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha delta epsilon zeta"))
      .toDF("doc_id", "text")
    val base = Sketches.hllRegisters(df, "text", 8, "hll")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(base.nonEmpty && base.forall(_._2 >= 1))
    val re = Sketches.hllRegisters(df.repartition(13), "text", 8, "hll")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(re == base)
    // 6 distinct tokens, 256 registers: expect 6 registers unless hash collision
    assert(base.size <= 6 && base.size >= 5)
  }

  test("IR actions hll-registers / hll-distinct declarable") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val regs = Engine.run(Node.fromJson(
      """{"action":"hll-registers","params":[{"text":"text","b":8}],
        |"children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("t")
    assert(regs.count() >= 7) // 8 tokens, collisions rare
    val est = Engine.run(Node.fromJson(
      """{"action":"hll-distinct","params":[{"text":"text","b":8}],
        |"children":[{"action":"tap","params":["t"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("t").head
    assert(est.getLong(0) == 256L)
    assert(math.abs(est.getDouble(2) - 8.0) < 2.0) // linear counting, near-exact
  }
}
