package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training vs an INDEPENDENT in-memory reference
  * implementation — the general merge scan (stateful within a word) is
  * gated HERE; the adjacent-pair primitive and the full train/encode on
  * the distinct-character vocabulary have DuckDB gates
  * (`bpe_pair_counts`, `bpe_train`, `bpe_encode`). Plus the merge-scan,
  * batched-equals-sequential, and encoder laws.
  */
class TokenizerSpec extends AnyFunSuite {
  import TestSpark.spark

  // ---- independent reference: plain-Scala BPE on a word-count map ----
  private def refTrain(wordCnt: Map[String, Long], k: Int,
                       minPair: Long = 2L): Seq[(String, String, Long)] = {
    var words: Map[Seq[String], Long] =
      wordCnt.groupMapReduce(_._1.map(_.toString): Seq[String])(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty || counts.values.max < minPair) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((best._1._1, best._1._2, best._2))
        words = words.groupMapReduce { case (syms, _) =>
          Tokenizer.mergePair(syms, best._1._1, best._1._2)
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

  test("mergePair is left-to-right non-overlapping: aaaa -> (aa)(aa)") {
    assert(Tokenizer.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Tokenizer.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Tokenizer.mergePair(Seq("x", "a", "b", "a", "b"), "a", "b") == Seq("x", "ab", "ab"))
    assert(Tokenizer.mergePair(Seq("l", "o", "w"), "e", "r") == Seq("l", "o", "w"))
  }

  test("trainBpe matches the independent reference on a classic corpus") {
    // the subword-nmt walkthrough shape: low/lower/newest/widest
    val docs = corpus(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"))
    val got = Tokenizer.trainBpe(docs, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(got == want)
    // first merge on this corpus is the classic (e, s) from newest+widest
    assert(got.head._1 == "e" && got.head._2 == "s" && got.head._3 == 9L)
  }

  test("trainBpe is deterministic across runs and stops at minPairCount") {
    val docs = corpus((1L, "ab ab cd"), (2L, "ab cd cd x"))
    val a = Tokenizer.trainBpe(docs, "text", 10).collect().map(_.toSeq).toSeq
    val b = Tokenizer.trainBpe(docs, "text", 10).collect().map(_.toSeq).toSeq
    assert(a == b)
    // every emitted merge respects the floor; singleton pairs never emitted
    assert(a.forall(r => r(3).asInstanceOf[Long] >= 2L))
    assert(a.nonEmpty && a.size < 10) // early stop, not the full budget
  }

  test("trainBpeBatched equals sequential trainBpe (classic + adversarial corpora)") {
    // corpora chosen to exercise every stop rule of the batch selector:
    //  - classic: several disjoint merges per pass (real amortization)
    //  - runs:    self-pair argmax (created (aa, a) pairs force a stop)
    //  - shared:  top candidates share symbols ((a,b) vs (b,c) in "abc")
    //  - created: merging (x,y) creates (xy,z) that outranks the next
    //             old candidate — the dominance bound must stop the batch
    val corpora = Seq(
      corpus((1L, "low low low low low"), (2L, "lower lower"),
        (3L, "newest newest newest newest newest newest"),
        (4L, "widest widest widest")),
      corpus((1L, "aaaa aaaa aaa aa aaaa"), (2L, "aaaaaa aaa baab")),
      corpus((1L, "abc abc abc abc"), (2L, "ab bc abc cab")),
      corpus((1L, "xyz xyz xyz xyz xyz xyz xyz"), (2L, "xy pq pq pq")),
      // dominance-bound live-fire: (x,y) c=8 admitted, then (p,q) c=3 —
      // DISJOINT, so only the triple bound (created (xy,w)/(xy,z) c=4)
      // can correctly stop the batch before it; sequential rank-2 is the
      // created (xy,w)
      corpus((1L, "xyw xyw xyw xyw xyz xyz xyz xyz"), (2L, "pq pq pq")),
      // and its admit twin: (p,q) c=5 BEATS the created bound 4, so the
      // batch may (and must, for amortization) take both
      corpus((1L, "xyw xyw xyw xyw xyz xyz xyz xyz"), (2L, "pq pq pq pq pq")))
    for ((docs, ci) <- corpora.zipWithIndex; m <- Seq(1, 2, 4, 16)) {
      val seq = Tokenizer.trainBpe(docs, "text", 10)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val bat = Tokenizer.trainBpeBatched(docs, "text", 10, batchSize = m)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      assert(bat == seq, s"corpus $ci batchSize $m")
    }
  }

  test("trainBpeBatched equals sequential on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val words = (0 until 30).map { _ =>
        val len = 2 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w)).mkString(" ")
      val docs = corpus((1L, text))
      val seq = Tokenizer.trainBpe(docs, "text", 12)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val bat = Tokenizer.trainBpeBatched(docs, "text", 12, batchSize = 8)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      assert(bat == seq, s"trial $trial")
    }
  }

  test("pairCounts weights by word frequency (hand-computed)") {
    val s = spark
    import s.implicits._
    val words = Seq(("ab", 3L), ("abc", 2L), ("z", 5L)).toDF("word", "cnt")
    val got = Tokenizer.pairCounts(Tokenizer.symbolize(words))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (a,b): 3 (from ab) + 2 (from abc) = 5; (b,c): 2; "z" has no pairs
    assert(got == Map(("a", "b") -> 5L, ("b", "c") -> 2L))
  }

  test("encodeWord applies merges by RANK priority, not position") {
    // merges: rank0 (e,s), rank1 (es,t) — "best" must become b (es) t
    // then b (est); a position-greedy encoder would try (b,e) first if
    // it existed at a worse rank
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1, ("b", "e") -> 2)
    assert(Tokenizer.encodeWord("best", ranks) == Seq("b", "est"))
    // without (e,s) available the lower-priority (b,e) applies
    assert(Tokenizer.encodeWord("best", Map(("b", "e") -> 2)) == Seq("be", "s", "t"))
    assert(Tokenizer.encodeWord("xy", Map.empty) == Seq("x", "y"))
  }

  test("IR actions: bpe-train emits the model schema; bpe-encode loads a persisted model; validate is artifact-total") {
    import graft.ir.{Engine, EngineCtx, Node}
    val docs = corpus((1L, "newest newest newest widest widest lowest"))
    // train via IR, persist, encode via IR with the model path
    val trained = Engine.run(
      Node.fromJson("""{"action":"bpe-train","params":[{"text":"text","merges":3}],
        |"children":[{"action":"tap","params":["m"]}]}""".stripMargin),
      docs, EngineCtx(testMode = true)).taps("m")
    assert(trained.columns.toSeq == Seq("rank", "left", "right", "pair_count"))
    assert(trained.count() == 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString + "/m"
    Tokenizer.saveMerges(trained, dir)
    val encoded = Engine.run(
      Node.fromJson(s"""{"action":"bpe-encode","params":[{"text":"text","model-path":"$dir","out":"bpe"}],
        |"children":[{"action":"tap","params":["e"]}]}""".stripMargin),
      docs, EngineCtx(testMode = true)).taps("e")
    val toks = encoded.collect().head.getSeq[String](2)
    // the trained merges actually apply (fewer symbols than characters)
    assert(toks.nonEmpty && toks.length < "newestnewestnewestwidestwidestlowest".length)
    // validate/compile stays total when the model artifact does not exist
    val v = Engine.validate(
      Node.fromJson("""{"action":"bpe-encode","params":[{"text":"text","model-path":"/nope/m","out":"bpe"}],
        |"children":[{"action":"tap","params":["e"]}]}""".stripMargin),
      spark, EngineCtx(testMode = true), docs.schema)
    assert(v.isEmpty, v.mkString("; "))
  }

  test("encode() frame keeps input columns, tokenizes like training, round-trips trained merges") {
    val docs = corpus((1L, "newest lowest"), (2L, null.asInstanceOf[String]))
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "__unused"))
    val out = Tokenizer.encode(docs, "text", merges, "bpe").orderBy("doc_id").collect()
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getSeq[String](2) == Seq("n", "e", "w", "est", "l", "o", "w", "est"))
    assert(out(1).getSeq[String](2).isEmpty) // null text -> empty tokens
  }

  test("codegen encode == per-row reference (incl. '#', punct, empty) and no object boundary in the plan") {
    // r17: encode() runs as a SubwordEncode codegen expression instead
    // of mapPartitions — pin (a) token equality against the literal
    // per-row rule tokenizeWords(text).flatMap(encodeWord) on adversarial
    // text, (b) that the plan really lost its Ser/De row boundary
    val merges = Seq(("e", "s"), ("es", "t"), ("a", "a"), ("t", "h"))
    val rankOf = merges.zipWithIndex.toMap
    val texts = Seq("newest Widest", "a#b ##c", "AAAA aaa", "", "  ", "th the est",
      null.asInstanceOf[String], "punct, punct; 42x!")
    val docs = corpus(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val out = Tokenizer.encode(docs, "text", merges, "bpe").orderBy("doc_id")
    val got = out.collect().map(_.getSeq[String](2).toSeq).toSeq
    val want = texts.map { t =>
      if (t == null) Seq.empty[String]
      else Tokenizer.tokenizeWords(t).flatMap(Tokenizer.encodeWord(_, rankOf))
    }
    assert(got == want)
    // no object boundary: on this local relation the optimizer folds the
    // whole projection (ConvertToLocalRelation evaluates SubwordEncode's
    // interpreted eval at plan time — itself proof the non-codegen path
    // agrees); a parquet-backed scan keeps the expression inline, see the
    // committed wordpiece_encode/bpe_encode executed plans (plans/r17/)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      s"encode plan still has an object boundary:\n$plan")
  }

  test("delimiter-fold merge application == mergePair (the bpe_encode_general SQL lambda's law)") {
    // the r14 general-encode oracle replays one merge pass as a string
    // fold: merge when the accumulator's LAST symbol is `l` and the next
    // element is `r`. This is mergePair's left-to-right non-overlapping
    // scan because a merge's output l+r can never equal `l` (r is
    // non-empty), so a just-created symbol never re-merges as the left
    // side within the pass. Pin the equivalence as a seeded property
    // over overlap-inducing symbol alphabets (self-pairs, prefixes).
    def foldMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val acc = syms.foldLeft("|") { (a, x) =>
        if (x == r && a.endsWith("|" + l + "|"))
          a.substring(0, a.length - l.length - 1) + l + r + "|"
        else a + x + "|"
      }
      acc.split('|').toSeq.filter(_.nonEmpty)
    }
    val rng = new scala.util.Random(1414L)
    val alpha = Vector("a", "b", "ab", "aa", "ba", "aab", "bb")
    (1 to 3000).foreach { _ =>
      val syms = (0 until 1 + rng.nextInt(10)).map(_ => alpha(rng.nextInt(alpha.length)))
      val l = alpha(rng.nextInt(alpha.length))
      val r = alpha(rng.nextInt(alpha.length))
      assert(foldMerge(syms, l, r) == Tokenizer.mergePair(syms, l, r),
        s"syms=$syms merge=($l,$r)")
    }
    // the documented acid cases
    assert(foldMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(foldMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(foldMerge(Seq("aa", "aa", "aa"), "aa", "aa") == Seq("aaaa", "aa"))
  }
}
