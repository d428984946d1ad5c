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
  * The adjacent-pair primitive is oracle-gated (`bpe_pair_counts` —
  * DuckDB replays character pairs with `substr`); the iterative loop is
  * NOT SQL-expressible (the left-to-right merge scan is stateful within a
  * word — a string `replace` resumes AFTER each replacement and so
  * under-merges runs of 3+ identical symbols), so the loop is spec-gated
  * against an independent in-memory reference implementation instead.
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
               minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"trainBpe: numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = Materialize.dataset(symbolize(wordCounts(docs, textCol)))
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

  /** Encode text with a trained merge list — canonical BPE application:
    * per word, repeatedly apply the LOWEST-RANK merge present until none
    * applies (rank priority, not left-to-right greed — the rule HF/GPT-2
    * encoders follow). Map-only over the corpus; the merge table ships as
    * a broadcast-sized Scala map.
    *
    * Output: input columns + `outCol` array of subword tokens.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
             outCol: String): DataFrame = {
    val rankOf: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    // iterator-to-iterator mapPartitions, not a scalar UDF: the rank-
    // priority merge loop is genuinely imperative per word (same rule as
    // the Multimodal kernels), and the rankOf map ships once per task
    df.mapPartitions { rows =>
      rows.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        val toks =
          if (text == null) Seq.empty[String]
          else tokenizeWords(text).flatMap(encodeWord(_, rankOf))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ toks)
      }
    }(enc)
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
