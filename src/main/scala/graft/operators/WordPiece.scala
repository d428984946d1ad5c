package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training (Schuster & Nakajima 2012;
  * the BERT-family subword inducer) and the matching greedy encoder —
  * the third tokenizer family next to BPE ([[Tokenizer]]) and
  * unigram-LM ([[UnigramTokenizer]]).
  *
  * WordPiece differs from BPE in exactly one place: the merge argmax
  * maximizes the training-corpus LIKELIHOOD gain, not the raw pair
  * count — `score(a,b) = count(ab) / (count(a) * count(b))`, the
  * pointwise-mutual-information-style ratio every published WordPiece
  * description uses. Symbols carry the `##` continuation marker from the
  * start (word-initial `h`, word-internal `##e`), so the learned vocab
  * is directly the greedy encoder's vocab.
  *
  * Scale shape — identical to BPE's (the reason both train fine at
  * 100 TB): ONE corpus-sized shuffle (tokenize → word `groupBy` count),
  * then every merge round runs on the vocabulary-sized word table: one
  * adjacent-pair aggregate + one symbol-frequency aggregate (both
  * map-side combined), two broadcast joins of those model-sized tables,
  * a 1-row `TakeOrdered` argmax to the driver, and a map-only merge
  * pass. Lineage is truncated per round via [[Materialize]].
  *
  * Determinism: counts are integer sums; the score is computed as
  * `cnt / (lcnt * rcnt)` in IEEE doubles — the same two operations in
  * the same order on every engine — and the argmax tie-breaks by
  * (score DESC, pair count DESC, left ASC, right ASC).
  *
  * Correctness gates, layered like BPE's: the scored-pair primitive is
  * oracle-gated on the full corpus (`wordpiece_pair_scores`); the FULL
  * train and the trained-vocab greedy encode are oracle-gated end to
  * end on the distinct-character vocabulary (`wordpiece_train` /
  * `wordpiece_encode`); and the general-case merge scan (stateful
  * within a word, not SQL-expressible on runs) is spec-gated against an
  * independent in-memory reference. [[trainWordPieceBatched]] is the
  * production driver loop; [[trainWordPiece]] the one-merge-per-job
  * reference semantics.
  *
  * Reference scope note: the reference engine (mirabelle) has no
  * tokenizer surface; this is part of the training-data-pipeline
  * extension.
  */
object WordPiece {

  /** Continuation marker for word-internal pieces. */
  val Marker = "##"

  /** One symbolized vocabulary entry: the word as its current marked
    * symbol sequence, with its corpus frequency.
    */
  final case class WpWord(syms: Seq[String], cnt: Long)

  /** Output schema of the IR `wordpiece-train` action: the learned
    * vocabulary (base units rank -1, merge outputs at their merge rank).
    * Single source of truth for the validator's schema stub.
    */
  val VocabSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("piece",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** One learned merge, in application order. */
  final case class WpMerge(rank: Int, left: String, right: String,
                           score: Double, pair_count: Long)

  /** Word table → marked symbolized typed table: first character bare,
    * every later character prefixed with `##`.
    */
  def symbolize(words: DataFrame): Dataset[WpWord] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) =>
        WpWord(w.zipWithIndex.map { case (ch, i) =>
          if (i == 0) ch.toString else Marker + ch }, c)
      }
  }

  /** Symbol frequencies over the marked word table (vocab-sized input,
    * map-side combine). Output: (sym, cnt).
    */
  def unitCounts(words: Dataset[WpWord]): DataFrame =
    words.toDF()
      .select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("cnt")).as("cnt"))

  /** Adjacent-pair likelihood scores: pair counts joined to both unit
    * counts, `score = cnt / (lcnt * rcnt)` in IEEE doubles. Both join
    * sides are model-sized → broadcast. Output:
    * (l_sym, r_sym, cnt, score).
    */
  def pairScores(words: Dataset[WpWord]): DataFrame =
    pairScoresWithUnits(words)
      .select(col("l_sym"), col("r_sym"), col("cnt"), col("score"))

  /** [[pairScores]] keeping the joined per-side unit counts (`lcnt`,
    * `rcnt`) in the output — the batched trainer reads the dominance
    * bound's residuals off these columns of the same top-K collect
    * instead of running a separate unit-count probe job per pass.
    */
  private[operators] def pairScoresWithUnits(words: Dataset[WpWord]): DataFrame = {
    val df = words.toDF()
    val n = size(col("syms"))
    val pairs = df.filter(n >= 2)
      .select(col("cnt"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), n - 1).as("l"),
          slice(col("syms"), lit(2), n - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("l_sym"), col("p.r").as("r_sym"))
      .agg(sum(col("cnt")).as("cnt"))
    val units = unitCounts(words)
    pairs
      .join(broadcast(units.select(col("sym"), col("cnt").as("lcnt"))),
        col("l_sym") === col("sym")).drop("sym")
      .join(broadcast(units.select(col("sym"), col("cnt").as("rcnt"))),
        col("r_sym") === col("sym")).drop("sym")
      .select(col("l_sym"), col("r_sym"), col("cnt"), col("lcnt"), col("rcnt"),
        (col("cnt").cast("double") /
          (col("lcnt").cast("double") * col("rcnt").cast("double"))).as("score"))
  }

  /** The merged symbol of a (left, right) pair: the continuation marker
    * of the RIGHT side is absorbed (`h` + `##e` → `he`; `##l` + `##l` →
    * `##ll`), so markedness-by-position is preserved.
    */
  def mergedSym(left: String, right: String): String =
    left + right.stripPrefix(Marker)

  /** Left-to-right non-overlapping merge of (a, b) in one marked symbol
    * sequence — same scan rule as BPE's [[Tokenizer.mergePair]], but the
    * merged symbol strips the right marker.
    */
  def mergeMarked(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val arr = syms.toIndexedSeq
    val ab = mergedSym(a, b)
    var i = 0
    while (i < arr.length) {
      if (i + 1 < arr.length && arr(i) == a && arr(i + 1) == b) {
        out += ab; i += 2
      } else { out += arr(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` WordPiece merges over the corpus. Stops early when
    * no pair reaches `minPairCount`. Returns the merge table
    * (rank, left, right, score, pair_count).
    *
    * `numMerges = 0` is allowed and returns the empty table — the
    * resulting model is the pure character vocabulary (the IR encode
    * chain gate trains exactly this degenerate model, whose greedy
    * segmentation is oracle-replayable: one piece per character).
    */
  def trainWordPiece(docs: DataFrame, textCol: String, numMerges: Int,
                     minPairCount: Long = 2L): DataFrame =
    trainWordPieceWords(Tokenizer.wordCounts(docs, textCol), numMerges, minPairCount)

  /** [[trainWordPiece]] from an explicit word-frequency table (columns
    * `word`, `cnt`) — the filtered-vocabulary / pre-shuffled entry point,
    * mirroring [[Tokenizer.trainBpeWords]].
    */
  def trainWordPieceWords(wordFreqs: DataFrame, numMerges: Int,
                          minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 0, s"trainWordPiece: numMerges must be >= 0, got $numMerges")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    var words = Materialize.dataset(symbolize(wordFreqs))
    val merges = Seq.newBuilder[WpMerge]
    var rank = 0
    var done = numMerges == 0
    while (rank < numMerges && !done) {
      // floor FIRST, then score argmax: a cnt=1 pair of two rare units
      // scores near 1.0 and would hijack a stop-on-argmax rule — the
      // frequency floor is part of the argmax domain, not a stop check.
      // TakeOrdered argmax: no full sort, 1 row to the driver.
      val best = pairScores(words)
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("score").desc, col("cnt").desc,
          col("l_sym").asc, col("r_sym").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best.head.getString(0), best.head.getString(1))
        val (c, s) = (best.head.getLong(2), best.head.getDouble(3))
        merges += WpMerge(rank, l, r, s, c)
        words = Materialize.dataset(
          words.map(w => WpWord(mergeMarked(w.syms, l, r), w.cnt)))
        rank += 1
      }
    }
    spark.createDataFrame(merges.result())
      .select(col("rank"), col("left"), col("right"), col("score"), col("pair_count"))
  }

  /** Batched WordPiece training: EXACTLY the same merge list as
    * [[trainWordPiece]], with O(numMerges / batchSize) Spark passes
    * instead of one per merge — the WordPiece twin of
    * [[Tokenizer.trainBpeWordsBatched]] (same driver-bottleneck fix, same
    * prefix-selection discipline), with the dominance guard restated in
    * SCORE space because the likelihood argmax is not count-monotone:
    *
    *  1. Disjointness (stop, don't skip): a candidate is admitted only if
    *     its left, right, and merged symbol are unused by every admitted
    *     merge. Disjoint pairs keep both their pair count AND their unit
    *     counts, hence their exact IEEE score, when earlier batch merges
    *     are applied.
    *  2. Score dominance. After applying merge i = (a,b)→m with pair
    *     count cᵢ: (a) any created pair involves m, and since
    *     cnt(pair) ≤ min(cnt of each member) and cnt(m) = cᵢ, its score
    *     cnt/(lcnt·rcnt) is ≤ 1/cᵢ; (b) an old pair touching a or b can
    *     RE-SCORE upward (its unit denominator shrinks as occurrences of
    *     a/b are consumed) — but only up to 1/residual(s) where
    *     residual(s) = cnt(s) − cᵢ·(2 if a=b else 1) is the surviving
    *     occurrence count of the touched symbol (residual ≤ 0 means the
    *     symbol is gone and contributes nothing). A candidate is admitted
    *     only if its score is STRICTLY above the max of those bounds over
    *     all admitted merges.
    *
    * Under rules 1+2 the sequential argmax at each batched rank is the
    * batch's candidate at that rank, so batched ≡ sequential — pinned by
    * WordPieceSpec against [[trainWordPiece]] on adversarial corpora.
    */
  def trainWordPieceBatched(docs: DataFrame, textCol: String, numMerges: Int,
                            minPairCount: Long = 2L, batchSize: Int = 16): DataFrame =
    trainWordPieceWordsBatched(Tokenizer.wordCounts(docs, textCol), numMerges,
      minPairCount, batchSize)

  /** [[trainWordPieceBatched]] from an explicit word-frequency table. */
  def trainWordPieceWordsBatched(wordFreqs: DataFrame, numMerges: Int,
                                 minPairCount: Long = 2L, batchSize: Int = 16): DataFrame = {
    require(numMerges >= 0, s"trainWordPieceBatched: numMerges must be >= 0, got $numMerges")
    require(batchSize >= 1, s"trainWordPieceBatched: batchSize must be >= 1, got $batchSize")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    var words = Materialize.dataset(symbolize(wordFreqs))
    val merges = Seq.newBuilder[WpMerge]
    // every merge output applied so far — driver-side freshness universe:
    // a multi-raw-char symbol can only be live in the word table if an
    // earlier applied merge produced it (base units are single raw
    // chars), so this set is a conservative superset of "already live".
    // The STRING encoding of that fact is ambiguous when raw text
    // contains literal '#' (mergedSym("#", "###") == "##"), so the
    // prefix loop ends a batch after admitting a '#'-bearing merge —
    // batches stay prefixes of the sequential order on such tables too
    // (WordPieceSpec pins batched ≡ sequential on '#' corpora)
    val producedEver = scala.collection.mutable.HashSet.empty[String]
    var rank = 0
    var done = numMerges == 0
    while (rank < numMerges && !done) {
      // single consumer (this TakeOrdered collect) — no Materialize.
      // lcnt/rcnt ride the same collect: the dominance bound's residuals
      // read the top rows' own unit counts, no per-pass probe job.
      val topK = math.max(batchSize * 4, 64)
      val top = pairScoresWithUnits(words).filter(col("cnt") >= minPairCount)
        .orderBy(col("score").desc, col("cnt").desc,
          col("l_sym").asc, col("r_sym").asc)
        .limit(topK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
      if (top.isEmpty) done = true
      else {
        val passLimit = math.min(batchSize, numMerges - rank)
        // rule 1 first, driver-side and job-free: maximal disjoint prefix
        val used = scala.collection.mutable.HashSet.empty[String]
        val prefix = Vector.newBuilder[(String, String, Long, Long, Long, Double)]
        var nPre = 0
        var stop = false
        var i = 0
        while (!stop && nPre < passLimit && i < top.length) {
          val (l, r, c, lc, rc, sc) = top(i)
          val mm = mergedSym(l, r)
          if (nPre > 0 && (used(l) || used(r) || used(mm))) stop = true
          else {
            prefix += ((l, r, c, lc, rc, sc)); nPre += 1
            used += l; used += r; used += mm
            i += 1
            // literal-'#' raw characters make the marker prefix ambiguous
            // (mergedSym("#", "###") == "##" — stripPrefix cannot tell a
            // continuation marker from a raw '#'), which the driver-side
            // freshness guard's string-keyed producedEver set depends on.
            // End the batch after admitting such a merge: a shortened
            // batch is still a prefix of the sequential argmax order, so
            // batched ≡ sequential holds for '#'-bearing word tables too
            // (pinned in WordPieceSpec; the tokenize pipeline never
            // produces '#' — this only affects explicit word-table
            // callers. r16 ADVICE #1).
            if (l.stripPrefix(Marker).contains("#") ||
                r.stripPrefix(Marker).contains("#")) stop = true
          }
        }
        val disjoint = prefix.result()
        val selected =
          if (disjoint.length <= 1)
            disjoint.zipWithIndex.map { case ((l, r, c, _, _, sc), j) =>
              WpMerge(rank + j, l, r, sc, c) }
          else {
            // rule 2 — score-dominance cut over the prefix; the residual
            // bound's unit counts are the candidates' own lcnt/rcnt from
            // the top-K collect (the SAME pre-batch unit table the join
            // read), so the pass runs no extra job. Like the BPE
            // trainer's freshness guard, the dominance bound assumes a
            // produced symbol is not already live in the word table (a
            // pre-existing twin would add the created pair occurrences
            // onto existing pairs' counts and unit counts, outside what
            // the residual bound covers); liveness is over-approximated
            // driver-side by the applied-merge output set, and the batch
            // is cut after admitting a merge whose produced symbol that
            // set already knows — a conservative cut only shortens the
            // batch, which stays a prefix of the sequential argmax order.
            var scoreBound = 0.0
            var cut = false
            val admitted = Vector.newBuilder[WpMerge]
            var nAdm = 0
            disjoint.zipWithIndex.foreach { case ((l, r, c, lc, rc, sc), j) =>
              if (!cut) {
                if (j > 0 && sc <= scoreBound) cut = true
                else {
                  admitted += WpMerge(rank + nAdm, l, r, sc, c); nAdm += 1
                  var b = 1.0 / c.toDouble
                  val consumed = Seq(lc -> (if (l == r) 2L * c else c),
                    rc -> (if (l == r) 2L * c else c))
                  consumed.foreach { case (ucnt, eaten) =>
                    val residual = ucnt - eaten
                    if (residual > 0L) b = math.max(b, 1.0 / residual.toDouble)
                  }
                  scoreBound = math.max(scoreBound, b)
                  if (producedEver(mergedSym(l, r))) cut = true // freshness guard
                }
              }
            }
            admitted.result()
          }
        merges ++= selected
        rank += selected.length
        producedEver ++= selected.map(m => mergedSym(m.left, m.right))
        val batch = selected.map(m => (m.left, m.right))
        words = Materialize.dataset(words.map { w =>
          WpWord(batch.foldLeft(w.syms) { case (s, (a, b)) => mergeMarked(s, a, b) },
            w.cnt)
        })
      }
    }
    spark.createDataFrame(merges.result())
      .select(col("rank"), col("left"), col("right"), col("score"), col("pair_count"))
  }

  /** The learned vocabulary as a frame: every base unit of the corpus
    * (rank -1) plus each merge's output symbol at its merge rank. This is
    * the persisted model the greedy encoder loads.
    */
  def vocabFrame(docs: DataFrame, textCol: String, merges: DataFrame): DataFrame =
    vocabFrameWords(Tokenizer.wordCounts(docs, textCol), merges)

  /** [[vocabFrame]] from an explicit word-frequency table. */
  def vocabFrameWords(wordFreqs: DataFrame, merges: DataFrame): DataFrame = {
    val units = unitCounts(symbolize(wordFreqs))
      .select(col("sym").as("piece"), lit(-1).as("rank"))
    val merged = merges
      .select(concat(col("left"),
        regexp_replace(col("right"), "^##", "")).as("piece"),
        col("rank").cast("int").as("rank"))
    units.unionByName(merged)
  }

  /** Model persistence: the vocab table IS the model. */
  def saveVocab(vocab: DataFrame, path: String): Unit =
    vocab.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted vocab as the encoder's piece set. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Set[String] =
    spark.read.parquet(path).select("piece").collect()
      .map(_.getString(0)).toSet

  /** Greedy longest-match-first WordPiece segmentation of one word (the
    * published BERT `WordpieceTokenizer` rule): at each position take the
    * LONGEST vocab piece (word-internal candidates carry the `##`
    * prefix); if no piece matches, or the word exceeds `maxChars`, the
    * WHOLE word becomes `unk`.
    */
  def encodeWord(word: String, vocab: Set[String],
                 unk: String = "[UNK]", maxChars: Int = 100): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    if (n > maxChars) return Seq(unk)
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < n) {
      var end = n
      var cur: String = null
      while (cur == null && end > start) {
        val cand =
          if (start == 0) word.substring(start, end)
          else Marker + word.substring(start, end)
        if (vocab.contains(cand)) cur = cand else end -= 1
      }
      if (cur == null) return Seq(unk)
      out += cur
      start = end
    }
    out.result()
  }

  /** Encode text with a trained vocabulary — map-only over the corpus;
    * the vocab ships once per task inside a
    * [[graft.functions.WordPieceEncodeKernel]] codegen expression (r17:
    * was a row-at-a-time `mapPartitions` with its Ser/De boundary — see
    * [[Tokenizer.encode]]; the greedy longest-match loop is the same JVM
    * method, so tokens are bit-identical). Output: input columns +
    * `outCol` array of subword tokens (null text → empty).
    */
  def encode(df: DataFrame, textCol: String, vocab: Set[String],
             outCol: String, unk: String = "[UNK]"): DataFrame = {
    val B = org.apache.spark.sql.graft.Bridge
    df.withColumn(outCol, B.column(graft.functions.SubwordEncode(
      B.expression(col(textCol)), new graft.functions.WordPieceEncodeKernel(vocab, unk))))
  }
}
