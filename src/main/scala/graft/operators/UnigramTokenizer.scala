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
    val cand = candidates(words, maxPieceLen)
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
  def saveModel(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  def loadModel(spark: SparkSession, path: String): Map[String, Double] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Double]("logp")).toMap
}
