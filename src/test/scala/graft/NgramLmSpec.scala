package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** N-gram LM training + perplexity scoring laws, checked against an
  * independent in-memory reference implementation (same tokenization,
  * same add-α smoothing, computed with plain Scala collections).
  */
class NgramLmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import NgramLm.{Bos, Eos}

  // ---- independent reference implementation ----
  private def refToks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def refPadded(text: String, n: Int): Seq[String] =
    Seq.fill(math.max(n - 1, 0))(Bos) ++ refToks(text) :+ Eos

  private def refCounts(corpus: Seq[String], n: Int): Map[(String, String), Long] =
    corpus.flatMap { t =>
      val p = refPadded(t, n)
      (n - 1 until p.length).map(i => (p.slice(i - n + 1, i).mkString(" "), p(i)))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def refScore(corpus: Seq[String], text: String, n: Int,
                       alpha: Double): (Long, Double) = {
    val counts = refCounts(corpus, n)
    val ctxTot = counts.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val v = corpus.flatMap(refToks).distinct.size + 1L
    val p = refPadded(text, n)
    val lnps = (n - 1 until p.length).map { i =>
      val ctx = p.slice(i - n + 1, i).mkString(" ")
      val c = counts.getOrElse((ctx, p(i)), 0L)
      val t = ctxTot.getOrElse(ctx, 0L)
      StrictMath.log((c.toDouble + alpha) / (t.toDouble + alpha * v))
    }
    (lnps.size.toLong, lnps.foldLeft(0.0)(_ + _))
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat", "a"),
    (2L, "the dog sat on the log", "a"),
    (3L, "cats and dogs and cats", "b"),
    (4L, "entirely novel vocabulary here", "b"),
    (5L, "the cat sat", "c"))

  private def docsDf = {
    val s = spark; import s.implicits._
    corpus.toDF("doc_id", "text", "source")
  }

  test("trainCounts: bigram counts match hand computation incl BOS/EOS") {
    val got = NgramLm.trainCounts(docsDf, "text", 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == refCounts(corpus.map(_._2), 2))
    assert(got((Bos, "the")) == 3L)      // docs 1, 2, 5 start with "the"
    assert(got(("the", "cat")) == 2L)
    assert(got(("sat", Eos)) == 1L)      // doc 5 ends at "sat"
  }

  test("vocabSize: distinct tokens + EOS, BOS not counted") {
    val v = NgramLm.vocabSize(docsDf, "text")
    assert(v == corpus.flatMap(c => refToks(c._2)).distinct.size + 1L)
  }

  test("vocabSizeFromCounts == vocabSize at n=1,2,3 incl empty docs; empty corpus floors at 1") {
    val s = spark; import s.implicits._
    // include a token-less and a null-text doc: they contribute no tokens
    // but must not shift V under either derivation
    val weird = (corpus.map(c => (c._1, c._2)) ++
      Seq((6L, ""), (7L, null: String))).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val fromCounts = NgramLm.vocabSizeFromCounts(NgramLm.trainCounts(weird, "text", n))
      assert(fromCounts == NgramLm.vocabSize(weird, "text"), s"n=$n")
    }
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(NgramLm.vocabSizeFromCounts(NgramLm.trainCounts(empty, "text", 2)) == 1L)
    assert(NgramLm.vocabSize(empty, "text") == 1L)
  }

  test("score == in-memory reference for n = 1, 2, 3 (bit-exact doubles)") {
    for (n <- Seq(1, 2, 3)) {
      val counts = NgramLm.trainCounts(docsDf, "text", n)
      val model = NgramLm.Model(counts, n, 0.5, NgramLm.vocabSize(docsDf, "text"))
      val got = NgramLm.score(docsDf, "text", "doc_id", model)
        .select("doc_id", "n_scored", "logprob", "cross_entropy", "ppl")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))).toMap
      for ((id, text, _) <- corpus) {
        val (nS, lp) = refScore(corpus.map(_._2), text, n, 0.5)
        val (gN, gLp, gCe, gPpl) = got(id)
        assert(gN == nS, s"n_scored n=$n doc=$id")
        assert(gLp == lp, s"logprob n=$n doc=$id")   // exact, not approx
        assert(gCe == -lp / nS && gPpl == StrictMath.exp(-lp / nS))
      }
    }
  }

  test("unseen-context tokens score the uniform 1/V floor") {
    // train WITHOUT doc 4, score doc 4: every bigram has unseen context
    // except the BOS-start, so p = alpha / (alpha*V) = 1/V for those
    val s = spark; import s.implicits._
    val trainDocs = corpus.filter(_._1 != 4L).toDF("doc_id", "text", "source")
    val counts = NgramLm.trainCounts(trainDocs, "text", 2)
    val v = NgramLm.vocabSize(trainDocs, "text")
    val model = NgramLm.Model(counts, 2, 0.5, v)
    val lp = NgramLm.score(corpus.filter(_._1 == 4L).toDF("doc_id", "text", "source"),
        "text", "doc_id", model)
      .select("logprob").head.getDouble(0)
    // tokens 2..5 (novel ctx): ln(1/V) each; token 1 has ctx BOS (seen)
    val bosTot = refCounts(corpus.filter(_._1 != 4L).map(_._2), 2)
      .collect { case ((Bos, _), c) => c }.sum
    val expected = StrictMath.log(0.5 / (bosTot + 0.5 * v)) + 4 * StrictMath.log(1.0 / v)
    assert(lp == expected)
  }

  test("model save/load round-trip preserves scores exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ngramlm").toString
    NgramLm.train(docsDf, "text", 2, 0.5, dir)
    val m = NgramLm.loadModel(spark, dir)
    assert(m.n == 2 && m.alpha == 0.5 &&
      m.vocabSize == NgramLm.vocabSize(docsDf, "text"))
    val before = NgramLm.score(docsDf, "text", "doc_id",
        NgramLm.Model(NgramLm.trainCounts(docsDf, "text", 2), 2, 0.5, m.vocabSize))
      .select("doc_id", "logprob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = NgramLm.score(docsDf, "text", "doc_id", m)
      .select("doc_id", "logprob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(before == after)
  }

  test("IR actions: ngram-train persists + emits counts, ngram-score loads the artifact, ppl-bucket buckets; validate artifact-total") {
    import graft.ir.{Engine, EngineCtx, Node}
    val dir = java.nio.file.Files.createTempDirectory("ngram_ir").toString + "/m"
    val trained = Engine.run(
      Node.fromJson(s"""{"action":"ngram-train","params":[{"text":"text","n":2,"alpha":0.5,"path":"$dir"}],
        |"children":[{"action":"tap","params":["m"]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("m")
    assert(trained.columns.toSeq == Seq("ctx", "word", "cnt"))
    assert(trained.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      == refCounts(corpus.map(_._2), 2))
    val bucketed = Engine.run(
      Node.fromJson(s"""{"action":"ngram-score","params":[{"text":"text","id":"doc_id","model-path":"$dir"}],
        |"children":[{"action":"ppl-bucket","params":[{"id":"doc_id","ppl":"ppl"}],
        |             "children":[{"action":"tap","params":["b"]}]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("b")
    val byId = bucketed.select("doc_id", "logprob", "ppl_bucket").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    for ((id, text, _) <- corpus)
      assert(byId(id)._1 == refScore(corpus.map(_._2), text, 2, 0.5)._2)
    assert(byId.values.map(_._2).toSet == Set("head", "middle", "tail"))
    // buckets follow the reference ranking: rank r of 5 → floor(r*3/5)
    val refRank = corpus.map { case (id, text, _) =>
      val (nS, lp) = refScore(corpus.map(_._2), text, 2, 0.5)
      id -> StrictMath.exp(-lp / nS)
    }.sortBy { case (id, ppl) => (ppl, id) }.map(_._1).zipWithIndex.toMap
    for ((id, _, _) <- corpus) {
      val expect = Seq("head", "middle", "tail")(refRank(id) * 3 / corpus.size)
      assert(byId(id)._2 == expect, s"doc $id rank ${refRank(id)}")
    }
    // validate/compile stays total when the model artifact does not exist
    val v = Engine.validate(
      Node.fromJson("""{"action":"ngram-score","params":[{"text":"text","id":"doc_id","model-path":"/nope/m"}],
        |"children":[{"action":"tap","params":["s"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), docsDf.schema)
    assert(v.isEmpty, v.mkString("; "))
  }

  // ---- interpolated Kneser-Ney reference (bigram) ----
  private def refKnScore(corpus: Seq[String], text: String,
                         d: Double): (Long, Double) = {
    val counts = refCounts(corpus, 2)
    val ctxTot = counts.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val ctxN1 = counts.groupBy(_._1._1).map { case (c, m) => c -> m.size.toLong }
    val wordNw = counts.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = counts.size.toLong
    val v = corpus.flatMap(refToks).distinct.size + 1L
    val denom = (b + v).toDouble
    val p = refPadded(text, 2)
    val lnps = (1 until p.length).map { i =>
      val (ctx, w) = (p(i - 1), p(i))
      val pcont = (wordNw.getOrElse(w, 0L).toDouble + 1.0) / denom
      val prob = ctxTot.get(ctx) match {
        case None => pcont
        case Some(t) =>
          math.max(counts.getOrElse((ctx, w), 0L).toDouble - d, 0.0) / t.toDouble +
            d * ctxN1(ctx).toDouble / t.toDouble * pcont
      }
      StrictMath.log(prob)
    }
    (lnps.size.toLong, lnps.foldLeft(0.0)(_ + _))
  }

  test("scoreKneserNey == in-memory KN reference; discounted mass is a distribution") {
    val model = NgramLm.trainKneserNey(docsDf, "text", discount = 0.75)
    val got = NgramLm.scoreKneserNey(docsDf, "text", "doc_id", model)
      .select("doc_id", "n_scored", "logprob").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    corpus.foreach { case (id, text, _) =>
      val (n, lp) = refKnScore(corpus.map(_._2), text, 0.75)
      assert(got(id)._1 == n)
      assert(got(id)._2 == lp, s"doc $id: ${got(id)._2} vs $lp")
    }
    // seen text scores strictly better than unrelated text under KN too
    val s2 = spark; import s2.implicits._
    val held = Seq((100L, "the cat sat on the mat"),
      (101L, "zz qq completely unseen words")).toDF("doc_id", "text")
    val ppl = NgramLm.scoreKneserNey(held, "text", "doc_id", model)
      .select("doc_id", "ppl").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl(100L) < ppl(101L))
    // unseen-context arm: backs off to the smoothed continuation (and the
    // reference agrees there as well)
    val (_, lpUnseen) = refKnScore(corpus.map(_._2), "zz qq completely unseen words", 0.75)
    val gotUnseen = NgramLm.scoreKneserNey(held, "text", "doc_id", model)
      .filter(col("doc_id") === 101L).select("logprob").head.getDouble(0)
    assert(gotUnseen == lpUnseen)
  }

  test("KN model save/load round-trip preserves scores exactly; IR kn-train/kn-score chain") {
    import graft.ir.{Engine, EngineCtx, Node}
    val tmp = java.nio.file.Files.createTempDirectory("kn").toString
    try {
      val model = NgramLm.trainKneserNey(docsDf, "text")
      val direct = NgramLm.scoreKneserNey(docsDf, "text", "doc_id", model)
        .select("doc_id", "logprob").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // IR chain: train -> save (side effect) then score via the artifact
      Engine.run(Node.fromJson(
          s"""{"action":"kn-train","params":[{"text":"text","path":"$tmp/m"}],
             | "children":[{"action":"tap","params":["m"]}]}""".stripMargin),
        docsDf, EngineCtx(testMode = true))
      val out = Engine.run(Node.fromJson(
          s"""{"action":"kn-score","params":[{"text":"text","id":"doc_id","model-path":"$tmp/m"}],
             | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
        docsDf, EngineCtx(testMode = true)).taps("out")
        .select("doc_id", "logprob").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out == direct)
      // validate is artifact-total on a missing model path
      val errs = Engine.validate(Node.fromJson(
          s"""{"action":"kn-score","params":[{"text":"text","id":"doc_id","model-path":"$tmp/nope"}],
             | "children":[{"action":"keep-keys","params":[["doc_id","ppl"]]}]}""".stripMargin),
        spark, EngineCtx(testMode = true), docsDf.schema)
      assert(errs.isEmpty, errs.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("scoreStupidBackoff == in-memory reference; seen ratio / backoff arms") {
    import graft.operators.{Materialize, NgramLm => L}
    val counts = Materialize(L.trainCounts(docsDf, "text", 2))
    val v = L.vocabSize(docsDf, "text")
    // independent reference
    val ref = refCounts(corpus.map(_._2), 2)
    val ctxTot = ref.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val uni = ref.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val n = ref.values.sum
    def refSb(text: String): Double = {
      val p = refPadded(text, 2)
      (1 until p.length).map { i =>
        val (c, w) = (p(i - 1), p(i))
        val s = ref.get((c, w)) match {
          case Some(cw) => cw.toDouble / ctxTot(c).toDouble
          case None => 0.4 * ((uni.getOrElse(w, 0L).toDouble + 1.0) / (n + v).toDouble)
        }
        StrictMath.log(s)
      }.foldLeft(0.0)(_ + _)
    }
    val s2 = spark; import s2.implicits._
    val held = corpus.map(t => (t._1, t._2)) :+
      ((200L, "zz unseen bigram the cat"))
    val got = L.scoreStupidBackoff(held.toDF("doc_id", "text"), "text", "doc_id",
        counts, v)
      .select("doc_id", "logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    held.foreach { case (id, text) =>
      assert(got(id) == refSb(text), s"doc $id")
    }
  }

  test("sb-score IR action reuses the ngram-train artifact") {
    import graft.ir.{Engine, EngineCtx, Node}
    val tmp = java.nio.file.Files.createTempDirectory("sb").toString
    try {
      NgramLm.train(docsDf, "text", 2, 0.5, s"$tmp/m")
      val out = Engine.run(Node.fromJson(
          s"""{"action":"sb-score","params":[{"text":"text","id":"doc_id","model-path":"$tmp/m"}],
             | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
        docsDf, EngineCtx(testMode = true)).taps("out")
      assert(out.count() == corpus.size)
      assert(out.columns.contains("ppl"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("pplBucket: rank thirds with floor arithmetic and id tie-break") {
    val s = spark; import s.implicits._
    // 7 rows → bucket sizes 3/2/2 under floor(rank*3/7); ties on ppl
    // broken by id ascending
    val scored = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 3.0),
      (5L, 4.0), (6L, 5.0), (7L, 6.0)).toDF("doc_id", "ppl")
    val got = NgramLm.pplBucket(scored, "doc_id", "ppl")
      .select("doc_id", "ppl_rank", "ppl_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.map(_._3).toSeq ==
      Seq("head", "head", "head", "middle", "middle", "tail", "tail"))
  }
}
