package graft

import graft.operators.{Tokenizer, UnigramTokenizer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramTokenizerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Independent Viterbi reference: plain recursion with memo, explicit
    * "longest piece wins ties" rule, structured differently from the
    * operator's iterative DP.
    */
  private def refSegment(word: String, logp: Map[String, Double],
                         maxLen: Int, unk: Double = -1e9): Seq[String] = {
    val memo = scala.collection.mutable.HashMap[Int, (Double, Seq[String])]()
    def go(pos: Int): (Double, Seq[String]) =
      if (pos == word.length) (0.0, Nil)
      else memo.getOrElseUpdate(pos, {
        // candidate pieces longest-first; strictly-better score replaces
        val opts = (math.min(maxLen, word.length - pos) to 1 by -1).flatMap { l =>
          val piece = word.substring(pos, pos + l)
          val lp = logp.get(piece).orElse(if (l == 1) Some(unk) else None)
          lp.map { v => val (rest, seq) = go(pos + l); (v + rest, piece +: seq) }
        }
        opts.maxBy(_._1) // maxBy keeps the FIRST max = longest piece
      })
    go(0)._2
  }

  private val corpus = Seq(
    (1L, "internationalization international nation nation nation"),
    (2L, "nation nationalism international internal"),
    (3L, "intern intern intern nation inter"))

  private def docsDf = {
    val s = spark; import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("segmentWord: hand-checked lattice, longer-piece tie-break, unk fallback, concat law") {
    val lp = Map("ab" -> math.log(0.4), "a" -> math.log(0.2), "b" -> math.log(0.2),
      "c" -> math.log(0.2))
    // "ab" as one piece beats a+b (log .4 > log .04)
    assert(UnigramTokenizer.segmentWord("ab", lp, 8) == Seq("ab"))
    assert(UnigramTokenizer.segmentWord("abc", lp, 8) == Seq("ab", "c"))
    // tie: p(xy) == p(x)p(y) → prefer the longer piece
    val tie = Map("xy" -> math.log(0.04), "x" -> math.log(0.2), "y" -> math.log(0.2))
    assert(UnigramTokenizer.segmentWord("xy", tie, 8) == Seq("xy"))
    // unknown chars never crash; concat always reconstructs the word
    val seg = UnigramTokenizer.segmentWord("azqb", lp, 8)
    assert(seg.mkString == "azqb")
    assert(UnigramTokenizer.segmentWord("", lp, 8).isEmpty)
  }

  test("segmentWord == independent recursive reference on a word battery") {
    val lp = Map("intern" -> -2.0, "ation" -> -2.2, "al" -> -3.0, "nation" -> -2.1,
      "i" -> -5.0, "n" -> -5.0, "t" -> -5.0, "e" -> -5.0, "r" -> -5.0,
      "a" -> -5.0, "o" -> -5.0, "l" -> -5.0, "s" -> -5.0, "m" -> -5.0,
      "z" -> -5.0, "is" -> -4.0)
    for (w <- Seq("internationalization", "nationalism", "international",
      "nation", "intern", "internal", "zzz", "a"))
      assert(UnigramTokenizer.segmentWord(w, lp, 8) == refSegment(w, lp, 8), w)
  }

  test("candidates: frequency-weighted substring counts match hand computation") {
    val s = spark; import s.implicits._
    val words = Seq(("aba", 2L), ("ab", 3L)).toDF("word", "cnt")
    val got = UnigramTokenizer.candidates(words, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aba"×2: a,b,a,ab,ba ; "ab"×3: a,b,ab
    assert(got == Map("a" -> 7L, "b" -> 5L, "ab" -> 5L, "ba" -> 2L))
  }

  test("seedVocab: distributed TakeOrdered seed == full-collect reference path") {
    val s = spark; import s.implicits._
    val words = Seq(("nation", 5L), ("intern", 4L), ("ab", 3L), ("zq", 1L))
      .toDF("word", "cnt")
    for (maxVocab <- Seq(3, 10, 100)) {
      // the pre-r10 algorithm: collect the ENTIRE candidate table, sort
      // locally, take top-k, append missing single chars
      val cand = UnigramTokenizer.candidates(words, 4).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val top = cand.sortBy { case (p, f) => (-f, p) }.take(maxVocab)
      val chars = cand.filter(_._1.length == 1)
      val expected = (top ++ chars.filterNot(c => top.exists(_._1 == c._1)))
        .sortBy { case (p, f) => (-f, p) }
      val got = UnigramTokenizer.seedVocab(words, 4, maxVocab)
      assert(got.toSeq == expected.toSeq, s"maxVocab=$maxVocab")
    }
  }

  test("train == trainDistributed (identical models), frequent words become single pieces") {
    val local = UnigramTokenizer.train(docsDf, "text", maxVocab = 40, maxPieceLen = 8, iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val dist = UnigramTokenizer.trainDistributed(docsDf, "text", maxVocab = 40, maxPieceLen = 8, iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(local == dist)
    val model = local.toMap
    // "nation" occurs 5 times and fits maxPieceLen → must be a learned piece
    assert(model.contains("nation"))
    // re-running is byte-identical
    val again = UnigramTokenizer.train(docsDf, "text", 40, 8, 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(again == local)
  }

  test("trainHardQuantized == trainDistributed vocabulary and counts (r14 oracle face)") {
    // the DECIMAL(38,6) grid exists to absorb cross-engine ln ulp drift;
    // it must NOT change which segmentations win on the gate fixtures —
    // same vocabulary, and logp within the grid step of the exact model
    val words = graft.operators.Tokenizer.wordCounts(docsDf, "text")
    val q = UnigramTokenizer.trainHardQuantized(words, maxVocab = 40,
        maxPieceLen = 8, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exact = UnigramTokenizer.trainDistributed(docsDf, "text", maxVocab = 40,
        maxPieceLen = 8, iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(q.map(_._1).toSet == exact.keySet, "same final vocabulary")
    q.foreach { case (p, _, lp) =>
      assert(math.abs(lp - exact(p)) <= 5e-7 + 1e-12, s"piece $p logp off-grid") }
    // quantized logp really is on the 1e-6 decimal grid
    q.foreach { case (p, _, lp) =>
      val scaled = BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert((scaled.toDouble - lp).abs < 1e-12, s"piece $p not on grid") }
  }

  test("softCountsLinear == softCounts within float tolerance (the r14 oracle twin)") {
    // the product-space twin exists so the DuckDB gate can replay the
    // forward-backward bit-for-bit; it must agree with the log-space
    // production face up to float round-off on every battery word
    val s = spark
    import s.implicits._
    val words = Seq("nation", "nations", "internation", "aaaa", "ab",
      "mississippi", "na", "onat")
    val pieces = words.flatMap(w => for {
      i <- 0 until w.length; l <- 1 to math.min(3, w.length - i)
    } yield w.substring(i, i + l)).distinct
    val p = pieces.map(x => x -> 1.0 / (2 + x.length)).toMap
    val logp = p.map { case (k, v) => k -> StrictMath.log(v) }
    for (w <- words) {
      val lin = UnigramTokenizer.softCountsLinear(w, p, 3).toMap
      val (soft, z) = UnigramTokenizer.softCounts(w, logp, 3)
      assert(lin.keySet == soft.keySet, s"word $w piece sets differ")
      lin.foreach { case (piece, e) =>
        assert(math.abs(e - soft(piece)) <= 1e-9 * math.max(1.0, soft(piece)),
          s"word $w piece $piece: linear $e vs log-space ${soft(piece)}") }
      assert(z != Double.NegativeInfinity)
    }
    // OOV skip: a piece absent from the model never earns counts
    val noAa = UnigramTokenizer.softCountsLinear("aaaa", p - "aa" - "aaa", 3).toMap
    assert(noAa.keySet == Set("a"))
    assert(math.abs(noAa("a") - 4.0) < 1e-12, s"pure single-char lattice: ${noAa("a")}")
    // table face: sorted-word fold, count-weighted
    val tbl = UnigramTokenizer.softCountsTable(
      Seq(("ab", 3L), ("na", 2L)).toDF("word", "cnt"), p, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // "ab" and "na" each have paths x·y (1/3·1/3) and xy (1/4);
    // Z = 1/9 + 1/4 for both. Piece "a" earns from BOTH words.
    val z2 = 1.0 / 9 + 1.0 / 4
    assert(math.abs(tbl("ab") - 3.0 * (0.25 / z2)) < 1e-9)
    assert(math.abs(tbl("a") - (3.0 + 2.0) * ((1.0 / 9) / z2)) < 1e-9)
    assert(math.abs(tbl("na") - 2.0 * (0.25 / z2)) < 1e-9)
  }

  test("softCounts: hand-checked two-path lattice posteriors and word likelihood") {
    // word "ab", vocab {a, b, ab}: two segmentations — [ab] and [a, b]
    val (pa, pb, pab) = (0.2, 0.3, 0.5)
    val lp = Map("a" -> math.log(pa), "b" -> math.log(pb), "ab" -> math.log(pab))
    val (counts, z) = UnigramTokenizer.softCounts("ab", lp, 8)
    val zTrue = pab + pa * pb
    assert(math.abs(math.exp(z) - zTrue) < 1e-12)
    assert(math.abs(counts("ab") - pab / zTrue) < 1e-12)
    assert(math.abs(counts("a") - pa * pb / zTrue) < 1e-12)
    assert(math.abs(counts("b") - pa * pb / zTrue) < 1e-12)
    // expected counts credit BOTH paths — hard-EM would give ab=1, a=b=0
    assert(counts("a") > 0 && counts("ab") > 0)
    // unknown chars: still total, z uses the unk floor
    val (cUnk, zUnk) = UnigramTokenizer.softCounts("zq", Map("z" -> -1.0), 8)
    assert(cUnk("z") > 0 && cUnk("q") > 0 && zUnk < -100)
  }

  test("soft-EM: corpus likelihood is non-decreasing over EM rounds") {
    val s = spark; import s.implicits._
    val words = graft.operators.Tokenizer.wordCounts(docsDf, "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def corpusLL(model: Map[String, Double]): Double =
      words.sortBy(_._1).map { case (w, c) =>
        c * UnigramTokenizer.softCounts(w, model, 8)._2
      }.sum
    val lls = (1 to 4).map { iters =>
      val m = UnigramTokenizer.trainSoft(docsDf, "text", maxVocab = 60,
        maxPieceLen = 8, emIters = iters, seedFactor = 1)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      corpusLL(m)
    }
    for (Seq(a, b) <- lls.sliding(2))
      assert(b >= a - 1e-9, s"likelihood decreased: $a -> $b over $lls")
  }

  test("trainSoft == trainSoftDistributed bit-identical under any partitioning") {
    val local = UnigramTokenizer.trainSoft(docsDf, "text", maxVocab = 30,
      maxPieceLen = 8, emIters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    for (parts <- Seq(1, 7)) {
      val dist = UnigramTokenizer.trainSoftDistributed(docsDf.repartition(parts),
        "text", maxVocab = 30, maxPieceLen = 8, emIters = 2)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(dist == local, s"parts=$parts")
    }
    val model = local.toMap
    assert(model.size <= 30)
    // coverage: every corpus character survives pruning
    for (ch <- "internationalizm".distinct)
      assert(model.contains(ch.toString), s"char $ch pruned")
    // the dominant word is a piece, as in hard-EM
    assert(model.contains("nation"))
  }

  test("soft-EM pruning: shrinks to maxVocab, drops lowest-likelihood-loss pieces first") {
    val s = spark; import s.implicits._
    val big = UnigramTokenizer.trainSoft(docsDf, "text", maxVocab = 100,
      maxPieceLen = 8, emIters = 2, seedFactor = 4)
      .collect().map(_.getString(0)).toSet
    val small = UnigramTokenizer.trainSoft(docsDf, "text", maxVocab = 20,
      maxPieceLen = 8, emIters = 2, seedFactor = 4)
      .collect().map(_.getString(0)).toSet
    assert(small.size <= 20 && big.size <= 100 && small.size < big.size)
    // chars are never pruned even under the tight budget
    assert("nation".forall(c => small.contains(c.toString)))
  }

  test("IR: unigram-train mode=soft trains the SentencePiece-faithful model") {
    import graft.ir.{Engine, EngineCtx, Node}
    val trained = Engine.run(Node.fromJson(
      """{"action":"unigram-train","params":[{"text":"text","vocab":30,"mode":"soft","iters":2}],
        |"children":[{"action":"tap","params":["m"]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("m")
    val direct = UnigramTokenizer.trainSoftDistributed(docsDf, "text", 30,
      maxPieceLen = 8, emIters = 2)
    assert(trained.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      direct.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    // static validation catches a typoed mode BEFORE any job runs
    val bad = Engine.validate(Node.fromJson(
      """{"action":"unigram-train","params":[{"text":"text","vocab":30,"mode":"sotf"}],
        |"children":[{"action":"tap","params":["m"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), docsDf.schema)
    assert(bad.exists(_.contains("mode")), bad.mkString("; "))
  }

  test("encode: model round-trip via parquet, concat law over documents, null-total") {
    val s = spark; import s.implicits._
    val modelDf = UnigramTokenizer.train(docsDf, "text", 40, 8, 3)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString + "/m"
    UnigramTokenizer.saveModel(modelDf, dir)
    val model = UnigramTokenizer.loadModel(spark, dir)
    val withNull = docsDf.union(Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val enc = UnigramTokenizer.encode(withNull, "text", model, "pieces")
      .orderBy("doc_id").collect()
    for (r <- enc.dropRight(1)) {
      val joined = r.getSeq[String](2).mkString
      val expected = Tokenizer.tokenizeWords(r.getString(1)).mkString
      assert(joined == expected)
    }
    assert(enc.last.getSeq[String](2).isEmpty) // null text → empty pieces
  }

  test("IR: unigram-train emits the model, unigram-encode loads the artifact, validate total") {
    import graft.ir.{Engine, EngineCtx, Node}
    val trained = Engine.run(Node.fromJson(
      """{"action":"unigram-train","params":[{"text":"text","vocab":40,"iters":2}],
        |"children":[{"action":"tap","params":["m"]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("m")
    assert(trained.columns.toSeq == Seq("piece", "logp"))
    assert(trained.count() > 0)
    val dir = java.nio.file.Files.createTempDirectory("unigram_ir").toString + "/m"
    UnigramTokenizer.saveModel(trained, dir)
    val enc = Engine.run(Node.fromJson(
      s"""{"action":"unigram-encode","params":[{"text":"text","model-path":"$dir","out":"pieces"}],
        |"children":[{"action":"tap","params":["e"]}]}""".stripMargin),
      docsDf, EngineCtx(testMode = true)).taps("e")
    assert(enc.select("pieces").head.getSeq[String](0).nonEmpty)
    val v = Engine.validate(Node.fromJson(
      """{"action":"unigram-encode","params":[{"text":"text","model-path":"/nope","out":"p"}],
        |"children":[{"action":"tap","params":["e"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), docsDf.schema)
    assert(v.isEmpty, v.mkString("; "))
  }
}
