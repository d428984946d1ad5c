package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018) — the other
  * major subword family next to BPE ([[Tokenizer]]): pieces carry
  * probabilities, a word's tokenization is the max-likelihood
  * segmentation over the piece lattice (Viterbi), and training fits the
  * piece distribution with EM (hard-EM here: Viterbi counts — the
  * deterministic, exactly-reproducible member of the family; soft-EM
  * differs only in using forward-backward expected counts).
  *
  * Scale shape — identical to the BPE trainer's, and for the same
  * reason: the corpus is touched by exactly ONE shuffle
  * ([[Tokenizer.wordCounts]]); candidate generation explodes substrings
  * of the DISTINCT-word table (vocabulary-sized), and each EM iteration
  * is a map-side Viterbi over that same word table with the current
  * piece log-probs broadcast (model-sized), followed by one
  * vocab-sized count aggregation and a model-sized collect — the
  * k-means/GD loop pattern.
  *
  * Determinism: candidate selection ties break by (freq DESC, piece ASC);
  * piece counts are integer sums; log-probs use `StrictMath.log`
  * (bit-reproducible on every JVM); Viterbi ties prefer the LONGER piece
  * ending at the position (fewer, larger pieces — the convention pinned
  * by UnigramTokenizerSpec's independent reference implementation).
  *
  * The candidate-count primitive is oracle-gated (`unigram_candidates`);
  * the EM loop's Viterbi scan is stateful within a word and not
  * SQL-expressible — spec-gated, like the BPE merge loop.
  */
object UnigramTokenizer {

  /** Substring candidates of every distinct word, frequency-weighted:
    * `(piece, freq)` where freq sums `word_count` over every occurrence
    * of the piece as a substring. Single characters are always candidates
    * (coverage guarantee); longer pieces capped at `maxPieceLen`.
    * Vocabulary-sized explode: `|words| × len × maxPieceLen` rows of a
    * DISTINCT-word table, independent of corpus bytes.
    */
  def candidates(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"unigram: maxPieceLen must be >= 1, got $maxPieceLen")
    words
      .select(col("word"), col("cnt"),
        posexplode(expr(
          s"""flatten(transform(sequence(1, length(word)), i ->
             |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
             |    substring(word, i, j - i + 1))))""".stripMargin)).as(Seq("__p", "piece")))
      .groupBy("piece").agg(sum(col("cnt")).as("freq"))
  }

  /** Top-`maxVocab` candidates by `(freq DESC, piece ASC)`, single
    * characters always retained regardless of rank.
    *
    * Driver traffic is MODEL-sized, not candidate-table-sized: the top-k
    * runs as a distributed TakeOrdered (`orderBy.limit`) and the
    * always-kept single characters are an alphabet-sized filter — the
    * full candidate table (|distinct words| × ~len × maxPieceLen rows,
    * billions at web scale) never reaches the driver.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int, maxVocab: Int): Array[(String, Long)] = {
    // two consumers (top-k branch + single-char branch) — materialize the
    // substring explode + count once (ReuseExchange is not reliable for
    // twin subtrees; see Curation.vocabDrift's post-mortem)
    val cand = Materialize(candidates(words, maxPieceLen))
    cand.orderBy(col("freq").desc, col("piece").asc).limit(maxVocab)
      .union(cand.filter(length(col("piece")) === 1))
      .distinct() // (piece, freq) rows are identical when a char is in both
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, f) => (-f, p) }
  }

  /** Max-likelihood (Viterbi) segmentation of one word under piece
    * log-probs. Ties prefer the longer piece ending at each position.
    * Unknown single characters fall back to `unkLogp` so segmentation is
    * TOTAL (never throws on unseen text).
    */
  def segmentWord(word: String, logp: collection.Map[String, Double],
                  maxPieceLen: Int, unkLogp: Double = -1e9): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // start index of the piece ending here
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val lp =
          if (logp.contains(piece)) logp(piece)
          else if (i - j == 1) unkLogp
          else Double.NegativeInfinity
        // j ascends, so the LONGEST piece ending at i is seen first;
        // strict '>' keeps it on ties (the pinned tie-break)
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
          best(i) = best(j) + lp
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    val out = scala.collection.mutable.ListBuffer[String]()
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      out.prepend(word.substring(j, pos))
      pos = j
    }
    out.toSeq
  }

  /** Hard-EM training: seed from substring frequencies, then `iters`
    * rounds of (broadcast log-probs → map-side Viterbi over the word
    * table → vocab-sized count → model-sized collect → renormalize).
    * Pieces that win zero Viterbi mass are pruned each round (single
    * chars kept at a floor). Returns the final `(piece, logp)` table.
    *
    * Hard-EM is the fast deterministic simplification; its vocabulary
    * can differ from SentencePiece's because only the single best
    * segmentation earns counts. [[trainSoft]]/[[trainSoftDistributed]]
    * implement Kudo's full algorithm (posterior-weighted expected counts
    * + likelihood-loss pruning) when SentencePiece-faithful vocabularies
    * matter.
    */
  def train(docs: DataFrame, textCol: String, maxVocab: Int,
            maxPieceLen: Int = 8, iters: Int = 3): DataFrame = {
    require(maxVocab >= 1 && iters >= 1,
      s"unigram: need maxVocab/iters >= 1, got $maxVocab/$iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Tokenizer.wordCounts(docs, textCol)
    val wordRows = words.collect().map(r => (r.getString(0), r.getLong(1)))
    // NOTE: the word table is collected ONCE here because the EM loop is
    // driver-coordinated; at web scale keep it distributed — the
    // iteration below maps 1:1 onto mapPartitions + groupBy (the
    // distributed twin runs in trainDistributed). This path is the
    // all-local convenience for vocab-sized corpora.
    trainFromWords(spark, wordRows, maxVocab, maxPieceLen, iters)
  }

  /** The driver-math core of [[train]], shared with the distributed
    * variant: deterministic hard-EM over an explicit word-count table.
    */
  private[operators] def trainFromWords(spark: SparkSession,
                                        wordRows: Array[(String, Long)],
                                        maxVocab: Int, maxPieceLen: Int,
                                        iters: Int): DataFrame = {
    import spark.implicits._
    // seed: substring freqs (same math as candidates(), locally)
    val freq = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- wordRows; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxPieceLen))
      freq.update(w.substring(i, j), freq.getOrElse(w.substring(i, j), 0L) + c)
    val sorted = freq.toArray.sortBy { case (p, f) => (-f, p) }
    val top = sorted.take(maxVocab)
    var vocab: Map[String, Long] =
      (top ++ sorted.filter(_._1.length == 1)
        .filterNot(c => top.exists(_._1 == c._1))).toMap
    var logp: Map[String, Double] = normalize(vocab)
    var it = 0
    while (it < iters) {
      val counts = scala.collection.mutable.HashMap[String, Long]()
      for ((w, c) <- wordRows; piece <- segmentWord(w, logp, maxPieceLen))
        counts.update(piece, counts.getOrElse(piece, 0L) + c)
      // prune zero-mass pieces; keep single chars (coverage) at count 1
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }
      logp = normalize(vocab)
      it += 1
    }
    logp.toSeq.sortBy { case (p, lp) => (-lp, p) }.toDF("piece", "logp")
  }

  /** Distributed EM iteration twin: the same update as
    * [[trainFromWords]] but with the word table kept as a DataFrame —
    * map-side Viterbi with broadcast log-probs, one vocab-sized count
    * shuffle, model-sized collect. Used by [[trainDistributed]]; the two
    * produce IDENTICAL models (spec-pinned).
    */
  def trainDistributed(docs: DataFrame, textCol: String, maxVocab: Int,
                       maxPieceLen: Int = 8, iters: Int = 3): DataFrame = {
    require(maxVocab >= 1 && iters >= 1,
      s"unigram: need maxVocab/iters >= 1, got $maxVocab/$iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Materialize(Tokenizer.wordCounts(docs, textCol))
    val seed = seedVocab(words, maxPieceLen, maxVocab)
    var vocab: Map[String, Long] = seed.toMap
    var logp: Map[String, Double] = normalize(vocab)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(logp)
      val counts = words.as[(String, Long)]
        .mapPartitions { rows =>
          val lp = bc.value
          val local = scala.collection.mutable.HashMap[String, Long]()
          rows.foreach { case (w, c) =>
            segmentWord(w, lp, maxPieceLen).foreach(p =>
              local.update(p, local.getOrElse(p, 0L) + c))
          }
          local.iterator
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().toMap
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }
      logp = normalize(vocab)
      it += 1
    }
    logp.toSeq.sortBy { case (p, lp) => (-lp, p) }.toDF("piece", "logp")
  }

  private def normalize(vocab: Map[String, Long]): Map[String, Double] = {
    val total = vocab.values.sum.toDouble
    vocab.map { case (p, c) => p -> StrictMath.log(c.toDouble / total) }
  }

  /** Oracle-replayable hard-EM twin of [[trainDistributed]]: identical
    * EM (same seed, same distributed Viterbi counts, same prune/floor)
    * except every piece log-prob is rounded onto the DECIMAL(38,6) grid
    * after each normalization — the repo-wide transcendental-fold
    * convention ([[Sketches.ddBuckets]]): `StrictMath.log` and a SQL
    * engine's `ln` may disagree in the last ulp, and the 1e-6 grid
    * absorbs that before a Viterbi comparison could flip a
    * segmentation. Every other quantity in the loop is exact integer
    * or correctly-rounded IEEE arithmetic in a pinned evaluation
    * order, so the DuckDB oracle replays the ENTIRE train — seed
    * vocabulary, per-round max-likelihood segmentations (enumerated
    * with the pinned longest-piece tie-break), count/prune/floor, and
    * the final quantized log-probs — bit for bit (`unigram_train`
    * gate). Output: `(piece, cnt, logp)` of the final round, ordered
    * by piece.
    *
    * The rounding is confined to this gate face on purpose:
    * [[trainDistributed]] keeps full-precision `StrictMath.log`
    * (bit-reproducible across JVMs, which is the property a production
    * run needs); UnigramTokenizerSpec pins that the quantized twin
    * produces the same vocabulary and counts on the gate fixtures.
    */
  def trainHardQuantized(words: DataFrame, maxVocab: Int,
                         maxPieceLen: Int = 8, iters: Int = 3): DataFrame = {
    require(maxVocab >= 1 && iters >= 1,
      s"unigram: need maxVocab/iters >= 1, got $maxVocab/$iters")
    val spark = words.sparkSession
    import spark.implicits._
    def q6(x: Double): Double =
      // exact-binary BigDecimal + HALF_UP == a SQL CAST(double AS
      // DECIMAL(38,6)) (round half away from zero on the binary value);
      // BigDecimal.valueOf would round the SHORTEST DECIMAL RENDERING
      // instead and can disagree on representation boundaries
      new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def normalizeQ(vocab: Map[String, Long]): Map[String, Double] = {
      val total = vocab.values.sum.toDouble
      vocab.map { case (p, c) => p -> q6(StrictMath.log(c.toDouble / total)) }
    }
    val w = Materialize(words)
    var vocab: Map[String, Long] = seedVocab(w, maxPieceLen, maxVocab).toMap
    var logp: Map[String, Double] = normalizeQ(vocab)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(logp)
      val counts = w.as[(String, Long)]
        .mapPartitions { rows =>
          val lp = bc.value
          val local = scala.collection.mutable.HashMap[String, Long]()
          rows.foreach { case (word, c) =>
            segmentWord(word, lp, maxPieceLen).foreach(p =>
              local.update(p, local.getOrElse(p, 0L) + c))
          }
          local.iterator
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().toMap
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }
      logp = normalizeQ(vocab)
      it += 1
    }
    vocab.toSeq.map { case (p, c) => (p, c, logp(p)) }
      .sortBy(_._1).toDF("piece", "cnt", "logp")
  }

  /** Tokenize a text column with a trained model: per-word Viterbi under
    * the broadcast piece log-probs, concatenated in word order. Map-side
    * `mapPartitions`, total on null/unseen input.
    */
  def encode(df: DataFrame, textCol: String, model: Map[String, Double],
             out: String, maxPieceLen: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      org.apache.spark.sql.types.StructType(df.schema.fields :+
        org.apache.spark.sql.types.StructField(out,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    df.mapPartitions { rows =>
      val lp = bc.value
      rows.map { r =>
        val idx = r.fieldIndex(textCol)
        val pieces: Seq[String] =
          if (r.isNullAt(idx)) Nil
          else Tokenizer.tokenizeWords(r.getString(idx))
            .flatMap(w => segmentWord(w, lp, maxPieceLen))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pieces)
      }
    }(enc)
  }

  /** Model persistence (piece table is the model). */
  // ------------------------------------------------------------------
  // Soft-EM (Kudo 2018, the full SentencePiece algorithm): posterior-
  // weighted expected piece counts from a forward-backward pass over the
  // per-word segmentation lattice, plus likelihood-loss vocabulary
  // pruning. Hard-EM above keeps only the Viterbi path's counts; soft-EM
  // credits EVERY segmentation in proportion to its posterior — the
  // vocabulary it learns matches SentencePiece's semantics.
  // ------------------------------------------------------------------

  /** Viterbi (max-path) log-probability of segmenting `word` under
    * `logp` — the scoring half of [[segmentWord]], used by the pruner to
    * ask "how much likelihood do we lose if this piece must be spelled
    * out with the remaining pieces?".
    */
  private[operators] def viterbiScore(word: String, logp: collection.Map[String, Double],
                                      maxPieceLen: Int, unkLogp: Double = -1e9): Double = {
    val n = word.length
    if (n == 0) return 0.0
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val lp =
          if (logp.contains(piece)) logp(piece)
          else if (i - j == 1) unkLogp
          else Double.NegativeInfinity
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) best(i) = best(j) + lp
        j += 1
      }
      i += 1
    }
    best(n)
  }

  /** log(e^a + e^b) without overflow — fixed evaluation order so both
    * trainer twins accumulate identically.
    */
  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + StrictMath.log1p(StrictMath.exp(b - a))
    else b + StrictMath.log1p(StrictMath.exp(a - b))

  /** Forward-backward over one word's segmentation lattice: returns the
    * expected count of every piece occurrence (posterior-weighted over
    * ALL segmentations) and the word's log-likelihood `log Z`. Log-space
    * throughout, so 100-char agglutinations don't underflow. Unknown
    * single chars participate at `unkLogp` (total coverage, mirroring
    * [[segmentWord]]).
    */
  def softCounts(word: String, logp: collection.Map[String, Double],
                 maxPieceLen: Int, unkLogp: Double = -1e9): (collection.Map[String, Double], Double) = {
    val n = word.length
    val out = scala.collection.mutable.HashMap[String, Double]()
    if (n == 0) return (out, 0.0)
    def lpOf(j: Int, i: Int): Double = {
      val piece = word.substring(j, i)
      if (logp.contains(piece)) logp(piece)
      else if (i - j == 1) unkLogp
      else Double.NegativeInfinity
    }
    val la = Array.fill(n + 1)(Double.NegativeInfinity); la(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val v = lpOf(j, i)
        if (v != Double.NegativeInfinity && la(j) != Double.NegativeInfinity)
          la(i) = logAdd(la(i), la(j) + v)
        j += 1
      }
      i += 1
    }
    val lb = Array.fill(n + 1)(Double.NegativeInfinity); lb(n) = 0.0
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      val lim = math.min(n, j2 + maxPieceLen)
      while (i2 <= lim) {
        val v = lpOf(j2, i2)
        if (v != Double.NegativeInfinity && lb(i2) != Double.NegativeInfinity)
          lb(j2) = logAdd(lb(j2), v + lb(i2))
        i2 += 1
      }
      j2 -= 1
    }
    val z = la(n)
    if (z != Double.NegativeInfinity) {
      var ii = 1
      while (ii <= n) {
        var jj = math.max(0, ii - maxPieceLen)
        while (jj < ii) {
          val v = lpOf(jj, ii)
          if (v != Double.NegativeInfinity &&
            la(jj) != Double.NegativeInfinity && lb(ii) != Double.NegativeInfinity) {
            val piece = word.substring(jj, ii)
            out.update(piece, out.getOrElse(piece, 0.0) +
              StrictMath.exp(la(jj) + v + lb(ii) - z))
          }
          jj += 1
        }
        ii += 1
      }
    }
    (out, z)
  }

  /** PRODUCT-space forward-backward expected counts for ONE word — the
    * oracle-replayable twin of [[softCounts]]. [[softCounts]] runs in
    * log space with [[logAdd]] (the numerically-robust production
    * form), but log-sum-exp cannot be replayed bit-for-bit by a SQL
    * engine (its exp/log differ in the last ulp and the grouping-by-
    * prefix association differs from any SQL formulation). This twin
    * fixes EVERY floating operation and its order so the DuckDB gate
    * (`unigram_soft_counts`) hashes bit-exactly:
    *
    *  - probabilities arrive ALREADY quantized linear-space values;
    *  - forward: `α(0)=1; α(i) = ((0 + α(i−3)·p₃) + α(i−2)·p₂) +
    *    α(i−1)·p₁` (a missing/OOV term contributes literal `0.0` —
    *    `x + 0.0 == x` exactly for the non-negative α, so skipping and
    *    adding zero are the same IEEE value);
    *  - backward mirrored with the ascending-length order
    *    `((0 + t₁) + t₂) + t₃`;
    *  - per-word occurrence posteriors `α(j)·p·β(i)/Z` fold in
    *    (j, i) ascending order per piece.
    *
    * Underflow bound: α ≥ p_min^len, fine in double for the gate's
    * short words; at production lengths use [[softCounts]] — this twin
    * exists to PIN the recurrence, UnigramTokenizerSpec pins the two
    * faces against each other within float tolerance.
    */
  def softCountsLinear(word: String, p: collection.Map[String, Double],
                       maxPieceLen: Int): Seq[(String, Double)] = {
    val n = word.length
    if (n == 0) return Nil
    def pOf(j: Int, i: Int): Double = p.getOrElse(word.substring(j, i), 0.0)
    val a = Array.fill(n + 1)(0.0); a(0) = 1.0
    var i = 1
    while (i <= n) {
      var acc = 0.0
      var d = maxPieceLen
      while (d >= 1) { // descending length == ascending j, the pinned order
        if (i - d >= 0) acc = acc + a(i - d) * pOf(i - d, i)
        d -= 1
      }
      a(i) = acc
      i += 1
    }
    val b = Array.fill(n + 1)(0.0); b(n) = 1.0
    var j = n - 1
    while (j >= 0) {
      var acc = 0.0
      var d = 1
      while (d <= maxPieceLen) { // ascending end position, the pinned order
        if (j + d <= n) acc = acc + pOf(j, j + d) * b(j + d)
        d += 1
      }
      b(j) = acc
      j -= 1
    }
    val z = a(n)
    if (z == 0.0) return Nil
    // (piece, posterior) per occurrence in (j, i) ascending order, then
    // a left fold per piece in that same order
    val occ = scala.collection.mutable.LinkedHashMap[String, Double]()
    var jj = 0
    while (jj < n) {
      var ii = jj + 1
      val lim = math.min(n, jj + maxPieceLen)
      while (ii <= lim) {
        val pv = pOf(jj, ii)
        if (pv != 0.0) {
          val piece = word.substring(jj, ii)
          occ.update(piece, occ.getOrElse(piece, 0.0) + a(jj) * pv * b(ii) / z)
        }
        ii += 1
      }
      jj += 1
    }
    occ.toSeq
  }

  /** Corpus-level [[softCountsLinear]]: expected piece counts summed
    * with the count weight in SORTED WORD ORDER per piece (the
    * deterministic fold the DuckDB twin replays with
    * `list(x ORDER BY word)`); output `(piece, expected)` ordered by
    * piece. The model map must hold quantized probabilities so both
    * engines start from identical doubles.
    */
  def softCountsTable(words: DataFrame, p: Map[String, Double],
                      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(p)
    val perWord = words.as[(String, Long)]
      .flatMap { case (w, c) =>
        softCountsLinear(w, bc.value, maxPieceLen)
          .map { case (piece, e) => (piece, w, e * c.toDouble) }
      }
      .toDF("piece", "word", "e")
    // deterministic per-piece total: sorted-word left fold inside the
    // aggregation (collect_list order is partition-dependent; the sort
    // + higher-order fold pins it — the trainSoftDistributed pattern,
    // one level since per-piece buffers are word-vocabulary-bounded)
    perWord.groupBy("piece")
      .agg(expr("aggregate(array_sort(collect_list(struct(word, e))), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.e)").as("expected"))
      .orderBy("piece")
  }

  /** Two-char word-prefix bucket for the deterministic two-level count
    * fold (see [[trainSoftDistributed]]).
    */
  private def softBucket(w: String): String = w.substring(0, math.min(2, w.length))

  /** Renormalize expected counts to log-probs, totalling in sorted piece
    * order (Map iteration order is construction-dependent; a fixed fold
    * order keeps the two trainer twins bit-identical).
    */
  private def normalizeDouble(vocab: Map[String, Double]): Map[String, Double] = {
    val total = vocab.toSeq.sortBy(_._1).foldLeft(0.0)(_ + _._2)
    vocab.map { case (p, c) => p -> StrictMath.log(c / total) }
  }

  /** The shared soft-EM outer loop: `emIters` expected-count rounds, then
    * likelihood-loss pruning to `ceil(|V| * shrink)` (never below
    * `maxVocab`, never pruning single chars), repeated until the
    * vocabulary fits. `estep` abstracts WHERE the expected counts are
    * computed (driver loop vs Spark job); everything else is identical
    * driver math, which is what makes local == distributed exact.
    *
    * Pruning follows Kudo: a piece's loss is its expected frequency times
    * (its own log-prob minus the Viterbi score of spelling it with the
    * OTHER pieces) — how much corpus log-likelihood disappears if it must
    * be composed rather than emitted.
    */
  private def softEmLoop(seed: Seq[(String, Double)], maxVocab: Int, maxPieceLen: Int,
                         emIters: Int, shrink: Double,
                         estep: Map[String, Double] => Map[String, Double]): Seq[(String, Double)] = {
    require(shrink > 0.0 && shrink < 1.0, s"unigram soft-EM: shrink in (0,1), got $shrink")
    var vocabFreq: Map[String, Double] = seed.toMap
    var logp: Map[String, Double] = normalizeDouble(vocabFreq)
    def emRounds(): Unit = {
      var e = 0
      while (e < emIters) {
        val counts = estep(logp)
        vocabFreq = vocabFreq.flatMap { case (p, _) =>
          val c = counts.getOrElse(p, 0.0)
          if (c > 0.0) Some(p -> c)
          // soft-EM gives every present char mass, so the floor only
          // catches true underflow; keep coverage regardless
          else if (p.length == 1) Some(p -> 1e-12)
          else None
        }
        logp = normalizeDouble(vocabFreq)
        e += 1
      }
    }
    emRounds()
    var prevSize = Int.MaxValue
    while (logp.size > maxVocab && logp.size < prevSize) {
      prevSize = logp.size
      val target = math.max(maxVocab, math.min(logp.size - 1,
        math.ceil(logp.size * shrink).toInt))
      val losses = logp.toSeq.map { case (p, lp) =>
        if (p.length == 1) (p, Double.PositiveInfinity) // coverage: never pruned
        else {
          val alt = viterbiScore(p, logp - p, maxPieceLen)
          (p, vocabFreq(p) * (lp - alt))
        }
      }
      val keep = losses.sortBy { case (p, l) => (-l, p) }.take(target).map(_._1).toSet
      vocabFreq = vocabFreq.filter { case (p, _) => keep(p) }
      logp = normalizeDouble(vocabFreq)
      emRounds()
    }
    logp.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /** Soft-EM unigram training, local driver loop — the convenience twin
    * of [[trainSoftDistributed]] (IDENTICAL models, spec-pinned). Seeds
    * `seedFactor * maxVocab` candidates so pruning has something to do,
    * exactly like SentencePiece's seed-then-shrink schedule.
    */
  def trainSoft(docs: DataFrame, textCol: String, maxVocab: Int,
                maxPieceLen: Int = 8, emIters: Int = 2, shrink: Double = 0.75,
                seedFactor: Int = 4): DataFrame = {
    require(maxVocab >= 1 && emIters >= 1,
      s"unigram soft-EM: need maxVocab/emIters >= 1, got $maxVocab/$emIters")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordRows = Tokenizer.wordCounts(docs, textCol).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val seed = localSeed(wordRows, maxPieceLen, seedFactor * maxVocab)
    val model = softEmLoop(seed, maxVocab, maxPieceLen, emIters, shrink,
      logp => localEstep(wordRows, logp, maxPieceLen))
    model.toDF("piece", "logp")
  }

  /** Distributed soft-EM: the word table stays a DataFrame; each E-step
    * is one Spark job — map-side forward-backward with broadcast
    * log-probs, then a TWO-LEVEL deterministic sum of the per-word
    * expected counts: (piece, 2-char word prefix) partials fold in
    * sorted word order, then each piece folds its bucket partials in
    * bucket order. Sorted folds make the double sums bit-identical to
    * the local twin under ANY partitioning; the bucket level bounds the
    * collect_list buffers (a single-char piece would otherwise collect
    * one entry per distinct word in one aggregation state). Driver
    * traffic stays model-sized: seed, per-round counts, final model.
    */
  def trainSoftDistributed(docs: DataFrame, textCol: String, maxVocab: Int,
                           maxPieceLen: Int = 8, emIters: Int = 2, shrink: Double = 0.75,
                           seedFactor: Int = 4): DataFrame = {
    require(maxVocab >= 1 && emIters >= 1,
      s"unigram soft-EM: need maxVocab/emIters >= 1, got $maxVocab/$emIters")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Materialize(Tokenizer.wordCounts(docs, textCol))
    val seed = seedVocab(words, maxPieceLen, seedFactor * maxVocab)
      .map { case (p, f) => (p, f.toDouble) }.toSeq
    val estep: Map[String, Double] => Map[String, Double] = { logp =>
      val bc = spark.sparkContext.broadcast(logp)
      val contrib = words.as[(String, Long)].flatMap { case (w, c) =>
        softCounts(w, bc.value, maxPieceLen)._1.iterator
          .map { case (p, e) => (p, softBucket(w), w, e * c) }
      }.toDF("piece", "bkt", "word", "v")
      val sortedFold = (pair: org.apache.spark.sql.Column) =>
        aggregate(array_sort(pair), lit(0.0), (a, x) => a + x.getField("v"))
      val perBucket = contrib.groupBy("piece", "bkt")
        .agg(sortedFold(collect_list(struct(col("word"), col("v")))).as("v"))
      perBucket.groupBy("piece")
        .agg(sortedFold(collect_list(struct(col("bkt"), col("v")))).as("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    softEmLoop(seed, maxVocab, maxPieceLen, emIters, shrink, estep)
      .toDF("piece", "logp")
  }

  /** Local seed: substring freqs (same math as [[seedVocab]], driver
    * arrays) → top-k plus single chars, as doubles.
    */
  private def localSeed(wordRows: Array[(String, Long)], maxPieceLen: Int,
                        maxSeed: Int): Seq[(String, Double)] = {
    val freq = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- wordRows; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxPieceLen))
      freq.update(w.substring(i, j), freq.getOrElse(w.substring(i, j), 0L) + c)
    val sorted = freq.toArray.sortBy { case (p, f) => (-f, p) }
    val top = sorted.take(maxSeed)
    (top ++ sorted.filter(_._1.length == 1).filterNot(c => top.exists(_._1 == c._1)))
      .sortBy { case (p, f) => (-f, p) }
      .map { case (p, f) => (p, f.toDouble) }.toSeq
  }

  /** Local E-step mirroring the distributed two-level fold EXACTLY:
    * contributions grouped by (piece, bucket), folded in sorted word
    * order, then bucket partials folded in bucket order — the same
    * additions in the same sequence as the Spark sorted-fold plan.
    */
  private def localEstep(wordRows: Array[(String, Long)],
                         logp: Map[String, Double], maxPieceLen: Int): Map[String, Double] = {
    val contrib = scala.collection.mutable.ArrayBuffer[(String, String, String, Double)]()
    for ((w, c) <- wordRows; (p, e) <- softCounts(w, logp, maxPieceLen)._1)
      contrib += ((p, softBucket(w), w, e * c))
    contrib.groupBy { case (p, b, _, _) => (p, b) }
      .map { case ((p, b), rows) =>
        (p, b, rows.sortBy(_._3).foldLeft(0.0)(_ + _._4))
      }
      .groupBy(_._1)
      .map { case (p, buckets) =>
        p -> buckets.toSeq.sortBy(_._2).foldLeft(0.0)(_ + _._3)
      }
  }

  def saveModel(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  def loadModel(spark: SparkSession, path: String): Map[String, Double] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Double]("logp")).toMap
}
