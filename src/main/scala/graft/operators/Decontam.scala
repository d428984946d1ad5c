package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation/benchmark set (shared word-shingles), the standard hygiene
  * step before LLM pretraining.
  *
  * Shape of the problem at 100 TB: the *training* side is huge, the
  * *benchmark* side is tiny (eval suites are MBs). So every design choice
  * here keeps the big side to ONE pass with map-side work only:
  *
  *  - the benchmark shingle set is deduped and **broadcast** — the join
  *    never shuffles the training side;
  *  - per-document shingles are `array_distinct`'d *before* explode, so
  *    hit counting is a plain `count(*)` with map-side partial
  *    aggregation on `doc_id` (rows after the broadcast join are only the
  *    matches — a ~0.x% trickle, not the corpus);
  *  - the scale path ([[contaminationBloom]]) additionally prefilters
  *    exploded training shingles through a driver-built Bloom filter
  *    before the exact join, so the join probe side shrinks by the Bloom
  *    rejection rate. False positives are then removed by the *same*
  *    exact broadcast join — the two paths return identical rows (gated
  *    against the same DuckDB oracle).
  *
  * A document counts as contaminated when it shares at least `minHits`
  * **distinct** shingles with the benchmark set (any benchmark doc —
  * overlap is a property of the text, not of a pairing).
  */
object Decontam {

  /** Output schema of [[overlapFraction]] minus the id column — the IR
    * validator's `decontam-overlap` stub derives its probe from this,
    * so validation can never drift from the operator.
    */
  val OverlapSchema: Seq[(String, org.apache.spark.sql.types.DataType)] = Seq(
    "n_shingles" -> org.apache.spark.sql.types.LongType,
    "n_overlap" -> org.apache.spark.sql.types.LongType,
    "overlap_frac" -> org.apache.spark.sql.types.DoubleType)

  /** Distinct (id, shingle) pairs for a corpus — bigram word shingles by
    * default, deduped per document before explode.
    */
  def shinglePairs(df: DataFrame, idCol: String, textCol: String,
                   shingles: Column => Column = c => Text.bigramShingles(Text.tokens(c))): DataFrame =
    df.select(col(idCol), explode(array_distinct(shingles(col(textCol)))).as("shingle"))

  /** Contamination report: (idCol, hits) for every training document
    * sharing ≥ `minHits` distinct shingles with the benchmark set.
    * Benchmark shingles are deduped and broadcast; the training side is
    * never shuffled before the (tiny, post-join) hit count.
    */
  def contaminationReport(train: DataFrame, bench: DataFrame, idCol: String,
                          textCol: String, minHits: Long = 3): DataFrame = {
    val benchSh = shinglePairs(bench, idCol, textCol).select("shingle").distinct()
    shinglePairs(train, idCol, textCol)
      .join(broadcast(benchSh), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** Per-document overlap FRACTION against the benchmark set — the
    * graded signal behind [[contaminationReport]]'s binary threshold
    * (reporting "14% of this doc's shingles appear in the eval suite"
    * instead of contaminated-or-not, the usual triage input). Output:
    * `(idCol, n_shingles, n_overlap, overlap_frac)` for EVERY training
    * document (no-shingle docs report 0 / 0 / 0.0).
    *
    * Same 100 TB shape as the report: benchmark shingles dedup +
    * broadcast, per-doc distinct before explode, the training corpus is
    * shuffled once on the id for the per-doc count.
    */
  def overlapFraction(train: DataFrame, bench: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val benchSh = shinglePairs(bench, idCol, textCol).select("shingle").distinct()
    val counts = shinglePairs(train, idCol, textCol)
      .join(broadcast(benchSh.withColumn("__hit", lit(1))), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_overlap"))
    train.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          coalesce(col("n_overlap"), lit(0L)).cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("overlap_frac"))
  }

  /** Scale path: identical result to [[contaminationReport]], with a
    * Bloom-filter prefilter in front of the exact join.
    *
    * The Bloom filter is built driver-side over the (small) benchmark
    * shingle set — `expectedItems` at `fpp` costs ~1.2 bytes/item at 1%,
    * so even a 100M-shingle benchmark corpus is a ~120 MB broadcast,
    * and a realistic eval suite is KBs. The prefilter rejects
    * (1 − fpp) of non-overlapping training shingles *before* the join,
    * shrinking the probe side by ~99%; Bloom false positives are killed
    * by the exact join that follows, so correctness never depends on fpp.
    *
    * The `mightContain` check is a deserialized predicate (not codegen) —
    * acceptable exactly because it sits on a 2-column projection and
    * replaces join work, not scan work.
    */
  def contaminationBloom(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, minHits: Long = 3,
                         expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    val benchSh = shinglePairs(bench, idCol, textCol).select("shingle").distinct()
    val bloom = benchSh.stat.bloomFilter("shingle", expectedItems, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bloomBc.value.mightContainString(s))
    shinglePairs(train, idCol, textCol)
      .filter(mightContain(col("shingle")))
      .join(broadcast(benchSh), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** Contamination ATTRIBUTION: which benchmark document leaked into
    * which training document — `(idCol, bench_id, shared)` for every
    * train×bench pair sharing ≥ `minHits` distinct shingles. The
    * any-benchmark [[contaminationReport]] answers "is this doc dirty";
    * this answers the audit question "dirty WITH WHAT", the shape eval
    * owners need to trace a leak.
    *
    * Scale: same broadcast as the report — the benchmark side is tiny,
    * so the join never shuffles the training side; pair volume is the
    * contamination trickle × benchmark fan-out, aggregated
    * map-side-partial on (train, bench).
    */
  def contaminationPairs(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, minHits: Long = 3): DataFrame = {
    val benchSh = shinglePairs(bench, idCol, textCol)
      .select(col(idCol).as("bench_id"), col("shingle"))
    shinglePairs(train, idCol, textCol)
      .join(broadcast(benchSh), "shingle")
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minHits)
  }

  /** Per-document contamination flag, map-side only — the STREAMING-safe
    * decontamination shape: the benchmark's distinct shingle set is
    * collected once (eval suites are MBs) and broadcast as a Set; each
    * document counts its own distinct shingles against it inside one
    * projection. No join, no aggregation across documents, so it runs
    * identically on a batch frame and inside any streaming plan (pinned
    * stream==batch in StreamingSpec) — exact membership, not Bloom, so
    * `hits` matches [[contaminationReport]] row for row.
    *
    * Output: input columns + `bench_hits` + `contaminated`
    * (hits ≥ minHits). At 100 TB this is the ingest-hygiene filter:
    * the corpus pays one map pass; only the model-sized benchmark set
    * moves.
    */
  def flagContaminated(docs: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, minHits: Long = 3,
                       shingles: Column => Column = c => Text.bigramShingles(Text.tokens(c))): DataFrame = {
    val spark = docs.sparkSession
    // the SAME shingle function on both sides — a custom `shingles` that
    // only reached the docs side would zero every hit silently
    val benchSet: Set[String] = shinglePairs(bench, idCol, textCol, shingles)
      .select("shingle").distinct()
      .collect().map(_.getString(0)).toSet
    val benchBc = spark.sparkContext.broadcast(benchSet)
    val hitsU = udf((ss: Seq[String]) =>
      if (ss == null) 0L else ss.count(benchBc.value.contains).toLong)
    docs
      .withColumn("bench_hits", hitsU(array_distinct(shingles(col(textCol)))))
      .withColumn("contaminated", col("bench_hits") >= minHits)
  }

  /** The cleaned corpus: training documents NOT flagged by
    * [[contaminationReport]] — a broadcast-able anti-join when the
    * flagged set is small (it is: contamination rates are ~1%).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, minHits: Long = 3): DataFrame = {
    val flagged = contaminationReport(train, bench, idCol, textCol, minHits)
      .select(col(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** FUZZY decontamination — near-duplicate benchmark leaks, not just
    * shared-n-gram ones: a paraphrased or lightly-edited eval question
    * can slip past [[contaminationReport]]'s exact-shingle counting but
    * still share MinHash bands with its source. One banded cross-corpus
    * join ([[Dedup.crossCorpusCandidates]]'s shape: a single (band, sig)
    * exchange, candidate volume tracks bucket collisions — neither side
    * broadcast, both can be fact-sized). Output: one row per flagged
    * train doc with the smallest colliding bench id as evidence.
    *
    * The exact and fuzzy flags COMPOSE: production decontamination runs
    * both and drops the union (GPT-3 app. C removed 13-gram overlaps;
    * near-dup leaks are the documented residue that motivated fuzzier
    * checks in later corpus audits).
    */
  def fuzzyContamination(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, k: Int = 8,
                         rowsPerBand: Int = 2): DataFrame = {
    // the flag only needs the SMALLEST colliding bench id, and min over
    // a union of buckets == min over per-bucket minima — so the bench
    // side collapses to ONE (band, sig, min id) owner row per bucket
    // BEFORE the join (the IncrementalDedup.storeHits r14 shape). A
    // bench-side boilerplate bucket then costs one row instead of
    // |bucket| rows per colliding train doc — exact, no cap, no recall
    // trade; the previous pair-join form paid the l×r bucket product.
    val owners = Dedup.bandTable(bench, textCol, idCol, k, rowsPerBand)
      .groupBy(col("band"), col("sig")).agg(min(col("__id")).as("__owner"))
    Dedup.bandTable(train, textCol, idCol, k, rowsPerBand)
      .join(owners, Seq("band", "sig"))
      .groupBy(col("__id").as(idCol))
      .agg(min(col("__owner")).as("bench_dup_of"))
  }

  /** [[decontaminate]]'s fuzzy twin: drop every train doc sharing any
    * MinHash band with any bench doc.
    */
  def decontaminateFuzzy(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, k: Int = 8,
                         rowsPerBand: Int = 2): DataFrame = {
    val flagged = fuzzyContamination(train, bench, idCol, textCol, k, rowsPerBand)
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
