package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, the
  * byte-pair-encoding merge induction every modern LLM tokenizer builds
  * on) and the matching encoder.
  *
  * Scale shape — the reason BPE trains fine at 100 TB: the corpus is
  * touched by exactly ONE shuffle (tokenize → word `groupBy` count);
  * everything after runs on the WORD-FREQUENCY table (vocabulary-sized,
  * ~10⁵-10⁷ rows regardless of corpus bytes — the same table HF
  * `tokenizers` and the original subword-nmt train from). Each of the K
  * merge rounds is then: adjacent-pair count over the word table
  * (map-side combined), a 1-row `TakeOrdered` argmax to the driver
  * (model-sized, like the GD loop's weight collect), and a map-only
  * symbol-merge pass. Lineage is truncated per round via [[Materialize]]
  * so the plan does not grow with K.
  *
  * Determinism: pair counts are integer sums; the argmax tie-breaks by
  * (count DESC, left ASC, right ASC); the merge scan is left-to-right
  * non-overlapping — every engine reproduces the merge list exactly.
  *
  * Correctness gates, layered: the adjacent-pair primitive is
  * oracle-gated on the full corpus (`bpe_pair_counts`); the FULL train
  * and the rank-priority encode are oracle-gated end to end on the
  * distinct-character vocabulary (`bpe_train` / `bpe_encode` — there a
  * delimited string `replace` IS the merge scan, because every symbol
  * occurs at most once per word); and the general-case merge scan
  * (where `replace` would under-merge runs of 3+ identical symbols —
  * stateful within a word, not SQL-expressible) is spec-gated against
  * an independent in-memory reference implementation. [[trainBpeBatched]]
  * is the production driver loop; [[trainBpe]] is the one-merge-per-job
  * reference semantics.
  */
object Tokenizer {

  /** One symbolized vocabulary entry: the word as its current symbol
    * sequence, with its corpus frequency.
    */
  final case class BpeWord(syms: Seq[String], cnt: Long)

  /** One learned merge, in application order. */
  final case class BpeMerge(rank: Int, left: String, right: String, pair_count: Long)

  /** Output schema of [[trainBpe]] — the single source of truth the IR
    * validator's `bpe-train` stub builds its empty probe from.
    */
  val MergesSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("left", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("right", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pair_count", org.apache.spark.sql.types.LongType, nullable = false)))

  /** Tokenizer-model persistence (the merge table is the model). */
  def saveMerges(merges: DataFrame, path: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table in application (rank) order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq

  /** Corpus → word-frequency table, the ONE corpus-sized shuffle
    * (map-side-combined count on the standard [[Text.tokens]] split).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Word table → symbolized typed table (each word split to single-char
    * symbols — byte-level start state, since the fixtures are ASCII).
    */
  def symbolize(words: DataFrame): Dataset[BpeWord] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => BpeWord(w.map(_.toString), c) }
  }

  /** Adjacent symbol-pair counts over a symbolized word table, weighted by
    * word frequency — the per-round aggregate (vocab-sized input,
    * map-side combine). Output: (left, right, cnt).
    */
  def pairCounts(words: Dataset[BpeWord]): DataFrame = {
    val df = words.toDF()
    val n = size(col("syms"))
    df.filter(n >= 2)
      .select(col("cnt"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), n - 1).as("l"),
          slice(col("syms"), lit(2), n - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Left-to-right non-overlapping merge of (a, b) → a+b in one symbol
    * sequence — the BPE training step ("aaaa" under (a,a) becomes
    * (aa)(aa), which a string replace would NOT produce).
    */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val arr = syms.toIndexedSeq
    var i = 0
    while (i < arr.length) {
      if (i + 1 < arr.length && arr(i) == a && arr(i + 1) == b) {
        out += a + b; i += 2
      } else { out += arr(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` BPE merges over the corpus. Stops early when no
    * pair reaches `minPairCount`. Returns the merge table
    * (rank, left, right, pair_count) — the persisted tokenizer model.
    */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 2L): DataFrame =
    trainBpeWords(wordCounts(docs, textCol), numMerges, minPairCount)

  /** [[trainBpe]] starting from an explicit word-frequency table
    * (columns `word`, `cnt`) — the entry point when the caller has already
    * paid the one corpus-sized shuffle, or wants a filtered vocabulary.
    */
  def trainBpeWords(wordFreqs: DataFrame, numMerges: Int,
                    minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"trainBpe: numMerges must be >= 1, got $numMerges")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    var words = Materialize.dataset(symbolize(wordFreqs))
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // TakeOrdered argmax: no full sort, 1 row to the driver
      val best = pairCounts(words)
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += BpeMerge(rank, l, r, c)
        words = Materialize.dataset(
          words.map(w => BpeWord(mergePair(w.syms, l, r), w.cnt)))
        rank += 1
      }
    }
    spark.createDataFrame(merges.result())
      .select(col("rank"), col("left"), col("right"), col("pair_count"))
  }

  /** Batched BPE training: EXACTLY the same merge list as [[trainBpe]],
    * with O(numMerges / batchSize) Spark passes instead of one pass per
    * merge — the fix for the driver-coordination bottleneck a 32k–50k
    * production vocabulary would hit (tens of thousands of sequential
    * argmax jobs, each with a Materialize barrier).
    *
    * Per pass: ONE pair-count aggregate, one model-sized top-K collect in
    * the exact sequential-argmax order (cnt DESC, left ASC, right ASC),
    * ONE neighbor-bound aggregate (pre-filtered to candidate-touching
    * triples, both bound families in one job), then a single map-only
    * merge pass that applies the whole selected batch in rank order.
    *
    * Why the batch reproduces sequential training bit-for-bit — the two
    * selection rules, both of which STOP the batch (prefix selection, not
    * skip-and-continue, so the batch is always a prefix of the sequential
    * argmax order):
    *
    *  1. Disjointness. A candidate is admitted only if its `left`,
    *     `right`, and produced `left+right` strings are all unused by
    *     every previously admitted merge (including their produced
    *     symbols). Applying a merge can neither create nor destroy an
    *     adjacency of a symbol-disjoint pair (merging fuses two adjacent
    *     symbols into one that sits in the same position — nothing is
    *     deleted between other symbols), so every admitted candidate's
    *     count is still exact when its sequential round arrives.
    *  2. New-pair dominance. Applying merge i = (a,b)→ab creates new
    *     adjacencies involving `ab`. Every occurrence of a new pair
    *     (ab, z) maps injectively to an original TRIPLE (a, b, z') (z' =
    *     first original symbol of z — prior batch merges are disjoint,
    *     so the mapping survives them), and (z, ab) to (z'', a, b) — so
    *     its count is ≤ max(maxTripleStarting(a,b),
    *     maxTripleEnding(a,b)), read from one adjacent-triple aggregate
    *     over THIS pass's word table. A candidate is admitted only if
    *     its count is STRICTLY greater than that bound over all
    *     previously admitted merges, so no created pair can outrank (or
    *     tie) it at its sequential round. (A looser bound from the pair
    *     table alone — max pair count touching a or b — stopped batches
    *     at 1-3 merges on real corpora; the triple bound is what makes
    *     the amortization land.)
    *
    *     Rule 2 additionally assumes the produced symbol `a+b` is FRESH
    *     — not already a live symbol in the word table. If `ab` already
    *     existed, a "created" pair (ab, z) would ADD onto the
    *     pre-existing pair's count, and the case split above (old pairs
    *     only decrease / created pairs bounded by the triple bound)
    *     would not bound the COMBINED count. Freshness is overwhelmingly
    *     the case in BPE (the left-to-right scan consumes every (a,b)
    *     adjacency the round it merges, and a string can only become a
    *     symbol BY being merged — at which point (a,b) can no longer be
    *     a top pair; 30k instrumented fuzz corpora never reached the
    *     state), but it is not a theorem over arbitrary word tables, so
    *     multi-candidate passes GUARD it — driver-side and job-free: a
    *     multi-char symbol can only be live in the word table if some
    *     earlier applied merge produced it (base units are single chars,
    *     produced strings >= 2 chars), so membership in the applied-merge
    *     output set is a conservative superset of "already live", and
    *     the batch is cut after the first candidate whose produced
    *     symbol is in that set. A conservative (or cut-to-one) pass
    *     degrades toward exactly sequential behavior, so correctness
    *     never depends on the assumption.
    *
    * Under those two rules, at sequential round j the argmax domain is:
    * candidates 1..j-1 (fully consumed — a left-to-right merge pass
    * leaves zero residual occurrences of its own pair), old pairs ranked
    * below candidate j (counts can only have decreased), and created
    * pairs (strictly below candidate j's count) — so the sequential
    * argmax IS candidate j. Pinned by TokenizerSpec against [[trainBpe]]
    * on adversarial overlapping-pair corpora, and oracle-gated end to end
    * (`bpe_train` replays a full small-vocab train in DuckDB as chained
    * CTEs).
    *
    * When the bound fires immediately (e.g. after a self-pair merge,
    * whose created (aa, a) pairs can be large), a pass degrades to one
    * merge — sequential behavior, never worse than [[trainBpe]] by more
    * than the two small bound aggregates.
    */
  def trainBpeBatched(docs: DataFrame, textCol: String, numMerges: Int,
                      minPairCount: Long = 2L, batchSize: Int = 16): DataFrame =
    trainBpeWordsBatched(wordCounts(docs, textCol), numMerges, minPairCount, batchSize)

  /** Pass count of the most recent [[trainBpeWordsBatched]] call on this
    * JVM — probe instrumentation for the jobs-per-merge amortization
    * tables (SCALING.md), not part of the model output. Each pass is one
    * pair-count aggregate + (for multi-candidate passes) the single
    * fused triple-bound aggregate; freshness is decided driver-side.
    */
  @volatile var lastBatchedPasses: Int = 0

  /** [[trainBpeBatched]] from an explicit word-frequency table. */
  def trainBpeWordsBatched(wordFreqs: DataFrame, numMerges: Int,
                           minPairCount: Long = 2L, batchSize: Int = 16): DataFrame = {
    require(numMerges >= 1, s"trainBpeBatched: numMerges must be >= 1, got $numMerges")
    require(batchSize >= 1, s"trainBpeBatched: batchSize must be >= 1, got $batchSize")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    var words = Materialize.dataset(symbolize(wordFreqs))
    val merges = Seq.newBuilder[BpeMerge]
    // every merge output applied so far — the driver-side symbol universe
    // behind the rule-2 freshness guard (superset of the word table's
    // live multi-char symbols; see the guard comment below)
    val producedEver = scala.collection.mutable.HashSet.empty[String]
    var rank = 0
    var done = false
    var passes = 0
    while (rank < numMerges && !done) {
      passes += 1
      // single consumer (this TakeOrdered collect) — no Materialize
      val topK = math.max(batchSize * 4, 64)
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(topK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty || top.head._3 < minPairCount) done = true
      else {
        val passLimit = math.min(batchSize, numMerges - rank)
        // rule 1 first, driver-side and job-free: the maximal
        // mutually-disjoint prefix of the argmax order
        val used = scala.collection.mutable.HashSet.empty[String]
        val prefix = Vector.newBuilder[(String, String, Long)]
        var nPre = 0
        var stop = false
        var i = 0
        while (!stop && nPre < passLimit && i < top.length) {
          val (l, r, c) = top(i)
          if (c < minPairCount ||
            (nPre > 0 && (used(l) || used(r) || used(l + r)))) stop = true
          else {
            prefix += ((l, r, c)); nPre += 1
            used += l; used += r; used += (l + r)
            i += 1
          }
        }
        val disjoint = prefix.result()
        val selected =
          if (disjoint.length <= 1) disjoint // sequential-cost pass: no bound jobs
          else {
            // rule 2 — triple bounds: per candidate pair (a,b), the max
            // weighted count over adjacent triples starting with (a,b)
            // and ending with (a,b). ONE job for both bound families:
            // the candidate predicate is on the triple's own key
            // columns, so it pushes BELOW the (x,y,z) aggregate (whole
            // groups pass or die before the exchange — the shuffle
            // carries candidate-touching triples only, not the whole
            // vocabulary's adjacency table), and the starting/ending
            // bounds ride one exploded (side, l, r) max aggregate.
            // Driver matches exactly by TUPLE key (no separator
            // ambiguity for arbitrary word tables).
            val cand = disjoint.map(t => (t._1, t._2)).toSet
            val lefts = cand.map(_._1).toSeq
            val rights = cand.map(_._2).toSeq
            val df = words.toDF()
            val n = size(col("syms"))
            val bounds = df.filter(n >= 3)
              .select(col("cnt"),
                explode(arrays_zip(
                  slice(col("syms"), lit(1), n - 2).as("x"),
                  slice(col("syms"), lit(2), n - 2).as("y"),
                  slice(col("syms"), lit(3), n - 2).as("z"))).as("t"))
              .filter((col("t.x").isin(lefts: _*) && col("t.y").isin(rights: _*)) ||
                (col("t.y").isin(lefts: _*) && col("t.z").isin(rights: _*)))
              .groupBy(col("t.x").as("x"), col("t.y").as("y"), col("t.z").as("z"))
              .agg(sum(col("cnt")).as("tc"))
              .select(col("tc"), explode(array(
                struct(lit(0).as("side"), col("x").as("l"), col("y").as("r")),
                struct(lit(1).as("side"), col("y").as("l"), col("z").as("r")))).as("k"))
              .filter(col("k.l").isin(lefts: _*) && col("k.r").isin(rights: _*))
              .groupBy(col("k.side").as("side"), col("k.l").as("l"), col("k.r").as("r"))
              .agg(max(col("tc")).as("m")).collect()
            def boundMap(side: Int) = bounds.iterator
              .filter(_.getInt(0) == side)
              .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3))
              .filter { case (k, _) => cand(k) }.toMap
            val maxStarting = boundMap(0)
            val maxEnding = boundMap(1)
            // cut the prefix at the first candidate a created pair could
            // outrank or tie at its sequential round
            var createdBound = 0L
            var cut = false
            val admitted = Vector.newBuilder[(String, String, Long)]
            disjoint.zipWithIndex.foreach { case ((l, r, c), j) =>
              if (!cut) {
                if (j > 0 && c <= createdBound) cut = true
                else {
                  admitted += ((l, r, c))
                  createdBound = math.max(createdBound,
                    math.max(maxStarting.getOrElse((l, r), 0L),
                      maxEnding.getOrElse((l, r), 0L)))
                  // freshness guard: a non-fresh produced symbol makes
                  // the triple bound unsound for every LATER candidate
                  // (created pairs add onto the pre-existing symbol's
                  // pairs), so the batch ends with this merge; the merge
                  // itself is the exact argmax of its own round either
                  // way. Freshness is decided DRIVER-SIDE, zero jobs: a
                  // multi-char symbol can only enter the word table as
                  // some earlier merge's output (base units are single
                  // chars; produced strings are >= 2 chars), so the set
                  // of merges applied so far is a superset of the live
                  // multi-char symbols — conservative only when an old
                  // produced symbol has since been fully consumed, and a
                  // conservative cut just shortens the batch (still a
                  // prefix of the sequential argmax order).
                  if (producedEver(l + r)) cut = true
                }
              }
            }
            admitted.result()
          }
        merges ++= selected.zipWithIndex.map { case ((l, r, c), j) =>
          BpeMerge(rank + j, l, r, c) }
        rank += selected.length
        producedEver ++= selected.map { case (l, r, _) => l + r }
        val batch = selected.map { case (l, r, _) => (l, r) }
        words = Materialize.dataset(words.map { w =>
          BpeWord(batch.foldLeft(w.syms) { case (s, (a, b)) => mergePair(s, a, b) },
            w.cnt)
        })
      }
    }
    lastBatchedPasses = passes
    spark.createDataFrame(merges.result())
      .select(col("rank"), col("left"), col("right"), col("pair_count"))
  }

  /** Encode text with a trained merge list — canonical BPE application:
    * per word, repeatedly apply the LOWEST-RANK merge present until none
    * applies (rank priority, not left-to-right greed — the rule HF/GPT-2
    * encoders follow). Map-only over the corpus; the merge table ships
    * once per task inside a [[graft.functions.BpeEncodeKernel]] codegen
    * expression (r17: was an iterator-to-iterator `mapPartitions`, whose
    * row-at-a-time object boundary paid a DeserializeToObject/
    * SerializeFromObject round trip per row and broke the surrounding
    * WholeStageCodegen span; the per-word merge loop is the same JVM
    * method, so tokens are bit-identical).
    *
    * Output: input columns + `outCol` array of subword tokens
    * (null text → empty array).
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
             outCol: String): DataFrame = {
    val B = org.apache.spark.sql.graft.Bridge
    df.withColumn(outCol, B.column(graft.functions.SubwordEncode(
      B.expression(col(textCol)), new graft.functions.BpeEncodeKernel(merges))))
  }

  /** The same lowercase-alnum split [[Text.tokens]] performs, on the
    * driver/executor side for the encoder.
    */
  private[graft] def tokenizeWords(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** Rank-priority BPE encode of one word. */
  def encodeWord(word: String, rankOf: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var continue = syms.length >= 2
    while (continue) {
      val candidates = syms.zip(syms.tail).flatMap(p => rankOf.get(p).map(p -> _))
      if (candidates.isEmpty) continue = false
      else {
        val (pair, _) = candidates.minBy(_._2)
        syms = mergePair(syms, pair._1, pair._2)
        continue = syms.length >= 2
      }
    }
    syms
  }
}
