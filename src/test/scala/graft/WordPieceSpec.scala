package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed WordPiece training vs an INDEPENDENT in-memory reference
  * — the general merge scan is gated HERE; the scored-pair primitive and
  * the full train/encode on the distinct-character vocabulary have
  * DuckDB gates (`wordpiece_pair_scores`, `wordpiece_train`,
  * `wordpiece_encode`). Plus the batched-equals-sequential and
  * greedy-encoder laws.
  */
class WordPieceSpec extends AnyFunSuite {
  import TestSpark.spark

  // ---- independent reference: plain-Scala WordPiece on a word-count map.
  // Uses the SAME double formula cnt/(lcnt*rcnt) as the operator so FP
  // ties resolve identically (the comparison is the point, not the FP).
  private def refTrain(wordCnt: Map[String, Long], k: Int,
                       minPair: Long = 2L): Seq[(String, String, Long)] = {
    def mark(w: String): Seq[String] =
      w.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else "##" + c }
    var words: Map[Seq[String], Long] =
      wordCnt.groupMapReduce(x => mark(x._1))(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      val uc = scala.collection.mutable.Map[String, Long]()
      for ((syms, c) <- words) {
        for (s <- syms) uc(s) = uc.getOrElse(s, 0L) + c
        for (i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      }
      val scored = pc.toSeq.map { case ((l, r), c) =>
        (l, r, c, c.toDouble / (uc(l).toDouble * uc(r).toDouble))
      }
      val viable = scored.filter(_._3 >= minPair)
      if (viable.isEmpty) done = true
      else {
        val best = viable.minBy { case (l, r, c, s) => (-s, -c, l, r) }
        out += ((best._1, best._2, best._3))
        words = words.groupMapReduce { case (syms, _) =>
          WordPiece.mergeMarked(syms, best._1, best._2)
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("symbolize marks continuations: 'low' -> [l, ##o, ##w]") {
    val s = spark
    import s.implicits._
    val w = Seq(("low", 5L)).toDF("word", "cnt")
    assert(WordPiece.symbolize(w).collect().head.syms == Seq("l", "##o", "##w"))
  }

  test("mergeMarked absorbs the right marker and scans non-overlapping") {
    assert(WordPiece.mergeMarked(Seq("h", "##e"), "h", "##e") == Seq("he"))
    assert(WordPiece.mergeMarked(Seq("a", "##l", "##l"), "##l", "##l") == Seq("a", "##ll"))
    // aaaa under (##a,##a): positions 2..4 are marked; 1st is bare
    assert(WordPiece.mergeMarked(Seq("a", "##a", "##a", "##a", "##a"), "##a", "##a")
      == Seq("a", "##aa", "##aa"))
    assert(WordPiece.mergedSym("he", "##llo") == "hello")
  }

  test("trainWordPiece matches the independent reference (score argmax, not count argmax)") {
    val docs = corpus(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"))
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = WordPiece.trainWordPiece(docs, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val want = refTrain(wc, 8)
    assert(got == want)
    // WordPiece's likelihood score favors EXCLUSIVE pairs over frequent
    // ones: BPE's first merge here is (e,s) cnt=9, but w appears only in
    // "low"/"lower"/"widest" contexts — assert the argmax is NOT simply
    // the max-count pair, proving the score path is exercised
    val bpeFirst = ("e", "s")
    assert((got.head._1, got.head._2) != bpeFirst,
      s"first merge ${got.head} should differ from BPE's count argmax $bpeFirst")
  }

  test("trainWordPiece is deterministic and stops at minPairCount; merges=0 is the char model") {
    val docs = corpus((1L, "ab ab cd"), (2L, "ab cd cd x"))
    val a = WordPiece.trainWordPiece(docs, "text", 10).collect().map(_.toSeq).toSeq
    val b = WordPiece.trainWordPiece(docs, "text", 10).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.forall(r => r(4).asInstanceOf[Long] >= 2L))
    assert(a.nonEmpty && a.size < 10) // early stop, not the full budget
    assert(WordPiece.trainWordPiece(docs, "text", 0).count() == 0L)
  }

  test("trainWordPieceBatched equals sequential (classic + adversarial + random corpora)") {
    val fixed = Seq(
      corpus((1L, "low low low low low"), (2L, "lower lower"),
        (3L, "newest newest newest newest newest newest"),
        (4L, "widest widest widest")),
      // near-consumed symbols: the residual re-score bound must fire
      corpus((1L, "he he he he he hx"), (2L, "zq zq zq he")),
      corpus((1L, "aaaa aaa aa aaaa"), (2L, "abab abab baab")),
      corpus((1L, "abc abc abc abc"), (2L, "ab bc cab")))
    val rnd = new scala.util.Random(7)
    val random = (0 until 4).map { _ =>
      val words = (0 until 25).map { _ =>
        (1 to 2 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString }
      corpus((1L, words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)).mkString(" ")))
    }
    for ((docs, ci) <- (fixed ++ random).zipWithIndex; m <- Seq(2, 8)) {
      val seq = WordPiece.trainWordPiece(docs, "text", 10)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val bat = WordPiece.trainWordPieceBatched(docs, "text", 10, batchSize = m)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      assert(bat == seq, s"corpus $ci batchSize $m")
    }
  }

  test("batched equals sequential on literal-'#' word tables (marker ambiguity)") {
    // raw '#' characters collide with the continuation marker in the
    // string-keyed freshness guard (mergedSym("#", "###") == "##"), so
    // the batched trainer ends a batch after admitting a '#'-bearing
    // merge — this pins that batched ≡ sequential STILL holds on such
    // tables (r16 ADVICE #1). Words reach this path only via the
    // explicit word-table entry points; the tokenize pipeline never
    // emits '#'.
    val s = spark
    import s.implicits._
    val fixed = Seq(
      Seq(("##", 6L), ("#a#", 4L), ("a#a", 5L), ("aa", 7L)),
      Seq(("#", 9L), ("##", 8L), ("###", 7L), ("####", 6L)),
      Seq(("a#", 5L), ("#a", 5L), ("##", 5L), ("ab", 9L), ("abab", 3L)))
    val rnd = new scala.util.Random(11)
    val random = (0 until 4).map { _ =>
      (0 until 20).map { i =>
        val w = (1 to 2 + rnd.nextInt(5))
          .map(_ => "a#b"(rnd.nextInt(3))).mkString
        (w + i.toString.take(0), 1L + rnd.nextInt(6)) // dup words fine: groupMap below
      }.groupMapReduce(_._1)(_._2)(_ + _).toSeq
    }
    for ((tbl, ci) <- (fixed ++ random).zipWithIndex; m <- Seq(2, 8)) {
      val words = tbl.toDF("word", "cnt")
      val seq = WordPiece.trainWordPieceWords(words, 10)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val bat = WordPiece.trainWordPieceWordsBatched(words, 10, batchSize = m)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      assert(bat == seq, s"'#' corpus $ci batchSize $m")
    }
  }

  test("vocabFrame = base units at rank -1 plus merge outputs at merge rank") {
    val docs = corpus((1L, "he he he she she"))
    val merges = WordPiece.trainWordPiece(docs, "text", 2)
    val vocab = WordPiece.vocabFrame(docs, "text", merges).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    // units of he/she: h, ##e, s, ##h, ##e
    assert(vocab.get("h").contains(-1) && vocab.get("##e").contains(-1)
      && vocab.get("s").contains(-1) && vocab.get("##h").contains(-1))
    val mergedPieces = vocab.filter(_._2 >= 0)
    assert(mergedPieces.nonEmpty && mergedPieces.keys.forall(p => p.replace("#", "").length >= 2))
  }

  test("encodeWord is greedy longest-match-first; failure UNKs the whole word") {
    val vocab = Set("h", "##e", "##l", "##o", "he", "##ll", "##llo", "hell")
    // longest match at position 0 is 'hell', then ##o
    assert(WordPiece.encodeWord("hello", vocab) == Seq("hell", "##o"))
    // remove 'hell': now 'he' then '##llo'
    assert(WordPiece.encodeWord("hello", vocab - "hell") == Seq("he", "##llo"))
    // char not in vocab anywhere -> whole word UNK, not partial output
    assert(WordPiece.encodeWord("hexo", vocab) == Seq("[UNK]"))
    // maxChars cap -> UNK
    assert(WordPiece.encodeWord("hello", vocab, maxChars = 3) == Seq("[UNK]"))
    assert(WordPiece.encodeWord("", vocab) == Nil)
  }

  test("codegen encode == per-row reference and no object boundary in the plan (r17)") {
    val vocab = Set("h", "##e", "##l", "##o", "he", "##ll", "x", "##y")
    val texts = Seq("hello He!", "xy x#y", null.asInstanceOf[String], "", "zzz")
    val docs = corpus(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val out = WordPiece.encode(docs, "text", vocab, "pieces").orderBy("doc_id")
    val got = out.collect().map(_.getSeq[String](2).toSeq).toSeq
    val want = texts.map { t =>
      if (t == null) Seq.empty[String]
      else graft.operators.Tokenizer.tokenizeWords(t).flatMap(WordPiece.encodeWord(_, vocab))
    }
    assert(got == want)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      s"encode plan still has an object boundary:\n$plan")
  }

  test("trained round-trip: encode concat law and model persistence") {
    val docs = corpus(
      (1L, "hugging hugging hugging hug hug"),
      (2L, "hugs hugs hug hugging"))
    val merges = WordPiece.trainWordPiece(docs, "text", 6)
    val vocabDf = WordPiece.vocabFrame(docs, "text", merges)
    val tmp = java.nio.file.Files.createTempDirectory("wp_model")
    try {
      WordPiece.saveVocab(vocabDf, s"$tmp/v")
      val vocab = WordPiece.loadVocab(spark, s"$tmp/v")
      val out = WordPiece.encode(docs, "text", vocab, "pieces")
        .select(col("doc_id"), col("pieces")).collect()
      assert(out.nonEmpty)
      // concat law: stripping ## and concatenating == the tokenized words
      for (r <- out) {
        val pieces = r.getSeq[String](1)
        assert(!pieces.contains("[UNK]")) // in-corpus text never UNKs
      }
      val joined = WordPiece.encode(docs, "text", vocab, "pieces")
        .select(col("doc_id"),
          concat_ws("", transform(col("pieces"),
            p => regexp_replace(p, "^##", ""))).as("glued"),
          regexp_replace(lower(col("text")), "[^a-z0-9]+", "").as("flat"))
        .collect()
      joined.foreach(r => assert(r.getString(1) == r.getString(2)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("encode: null text -> empty pieces; schema appends outCol") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = Set("a", "##b")
    val out = WordPiece.encode(df, "text", vocab, "pieces").orderBy("doc_id").collect()
    assert(out(0).getSeq[String](2) == Seq("a", "##b"))
    assert(out(1).getSeq[String](2).isEmpty)
  }
}
