package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries at
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  */
object Bench {

  /** Representative, performance-meaningful subset: scan-heavy aggs,
    * multi-join, keyed windows, per-key scans, LSH dedup, ANN.
    */
  val headline: Seq[String] = Seq(
    "tpch_q1", "tpch_q3_top_orders", "tpch_q5_region_revenue",
    "parts_by_type_revenue", "order_priority_counts", "sessionize",
    "sum_window", "by_sum", "percentiles", "coalesce_window",
    "ddt", "ewma", "throttle", "moving_event_window",
    "dedup_minhash_lsh", "dedup_minhash_lsh_xx", "dedup_simhash",
    "text_quality", "ann_topk", "ann_bucketed_topk", "ann_ivf_topk",
    "embedding_near_dup_bucketed",
    // source-decode, media-kernel, and banded near-dup throughput
    "riemann_decode", "prom_wire_decode", "media_features", "dedup_simhash_near",
    // iterative connected-components clustering
    "dedup_clusters",
    // curation: quality rules, PII scrub, line dedup, packing, as-of join
    "gopher_filter", "pii_redact", "line_dedup", "pack_nextfit", "asof_join",
    "ann_pq_topk", "semantic_dedup", "classifier_score",
    // quantized-scan ANN, sparse lexical retrieval, RAG chunking
    "ann_sq8_topk", "bm25_topk", "tfidf_cosine_pairs", "chunk_tokens",
    // composed IVF-PQ index, cross-corpus/streaming-twin LSH, DSIR
    // scoring, training-order materialization, corpus profiling
    "ann_ivfpq_topk", "dedup_cross_corpus", "near_dup_stream_twin",
    "dsir_ratio_sum", "corpus_shuffle", "interleave_sources",
    "corpus_profile",
    // round 8: normalization, boilerplate cut, blocklist filter, JL
    // projection (fused kernel), distributed GD classifier training
    "text_normalize", "boilerplate_lines", "url_blocklist_filter",
    "embedding_project", "classifier_train", "vocab_topk", "frequent_ngrams",
    "text_strip_html", "upsample_epochs", "decontam_overlap",
    "embedding_l2norm", "curriculum_order", "vocab_drift", "ngram_diversity",
    // round 9: BPE pair-count primitive (tokenizer-induction inner loop),
    // n-gram LM perplexity scoring + CCNet bucketing, hard negatives
    "bpe_pair_counts", "ngram_lm_score", "ppl_bucket_counts", "hard_negatives",
    "cms_token_counts", "temperature_mix", "pca_covariance", "unigram_candidates",
    // round 10: fixed-memory heavy hitters, bucketed hard-negative miner,
    // HLL distinct sketch, WordPiece pair-score primitive, KMV bottom-k
    // sampling, DoReMi mixture weights
    "heavy_hitters", "hard_negatives_bucketed", "hll_registers",
    "wordpiece_pair_scores", "kmv_row_sample", "doremi_weights",
    "warc_roundtrip", "nfc_normalize", "host_pagerank",
    // round 10 crawl loop: SURT keying, CDX index round trip, snapshot
    // collapse + diff, politeness schedule, sitemap XML explode,
    // refetch planning, mirror detection, charset-aware decode,
    // byte-level pretokens, deflate quality signal
    "surt_key", "cdx_roundtrip", "crawl_latest", "crawl_diff",
    "fetch_schedule", "sitemap_urls", "refetch_candidates", "mirror_hosts",
    "charset_detect", "bytelevel_pretokens", "compression_ratio",
    // round 10: KN + stupid-backoff smoothing, mask-boundary table,
    // rank-fusion ensemble
    "kneser_ney_score", "stupid_backoff_score", "pack_boundaries",
    "rank_fusion",
    // round 10: Aho-Corasick dictionary filter (C4 bad-words rule),
    // keep-best cluster dedup, robots META noindex parsing, vocabulary
    // OOV coverage, PSI drift buckets
    "badwords_filter", "dedup_cluster_keep_best", "noindex_filter",
    "oov_rate", "psi_report",
    // round 10: multiset-weighted MinHash (repetition-sensitive
    // near-dup), token-distribution entropy
    "dedup_weighted_lsh", "dedup_weighted_jaccard", "token_entropy",
    "kmv_overlap", "zipf_fit", "badwords_redact", "unimax_mix",
    "dedup_weighted_cross",
    // round 10: example-selection family — EL2N difficulty (probe train
    // + map-side scoring + global rank), within-cluster prototypicality,
    // greedy k-center coreset (k incremental min-dist rounds)
    "el2n_scores", "prototype_scores", "kcenter_coreset",
    "cartography_stats", "vocab_kl", "source_outliers", "mmr_rerank",
    "ann_ivfpq_persisted",
    // round 10 session 4: exact PPJoin similarity join, winnowing
    // fingerprints (fused kernel) + candidate pairs, Levenshtein confirm
    // funnel, Poisson-bootstrap CI, JSONL export/read round trip, HITS,
    // s-stemmer vocab, OPQ identity + persisted flat-codes index
    "dedup_jaccard_exact", "winnow_fingerprints", "winnow_candidates",
    "dedup_edit_confirm", "bootstrap_means", "jsonl_roundtrip",
    "hits_scores", "stem_vocab", "ann_opq_identity", "ann_opq_persisted",
    // round 10 session 5: diameter-independent connected components,
    // Morton z-curve layout key
    "dedup_clusters_star", "zorder_key",
    // round 10 session 6: encoding-corruption health pass, readability,
    // incremental dedup against the persisted signature store, Hilbert key
    "mojibake_health", "readability", "incremental_dedup", "hilbert_key",
    "csv_roundtrip", "fuzzy_decontam", "cluster_cap_sample", "script_profile",
    "chunk_sentences", "rank_normalize", "salted_join", "anchor_edges", "html_meta", "quality_cascade", "ks_drift", "dedup_lines_consecutive", "ir_text_health", "dup_rate_estimate",
    "bm25_persisted",
    // round 11: cross-doc exact-substring spans (Lee et al. ExactSubstr),
    // OTLP metrics wire decode, keep-first substring cut, leakage-free
    // cluster split, RSS/Atom parse round trip
    "shared_substring_spans", "otlp_metrics_wire_decode",
    "shared_substring_cut", "cluster_split", "feed_urls", "bm25_incremental",
    "ann_ivfpq_incremental", "substring_store_probe", "feed_discovery",
    // round 12: OTLP logs (third signal) through the wire codec, feed
    // event-time parse (try_to_timestamp cascade), DPO preference-pair
    // mining (one min_by aggregate)
    "otlp_logs_wire_decode", "feed_times", "preference_pairs", "best_of_n",
    "dedup_pair_eval", "dedup_pair_eval_sweep",
    // round 12: DDSketch bounded-state quantiles (one bucket-count
    // aggregate), key-skew pre-flight profile (count agg + top-k)
    "dd_quantiles", "key_skew_profile",
    // round 12: the whole curation chain as one composed pipeline
    // (quality gate -> exact dedup -> LSH near-dup prune -> decontam)
    "curation_e2e",
    // round 13: full batched BPE train + rank-priority encode (the
    // driver-round amortization story), mega-bucket cap planner probe
    "bpe_train", "bpe_encode", "lsh_cap_plan", "wordpiece_train",
    "wordpiece_encode")

  /** Queries the PREVIOUS round's contract line printed (the driver's
    * round-over-round diff reads only that line): the omission rule
    * below must never drop one of these while any unpinned query can be
    * dropped instead, or the diff reports a phantom "dropped_from_bench"
    * every time a query gets FASTER and rotates out of the
    * slowest-printed window (r16 PERF showed 5 such phantom drops; all
    * five had actually improved). Additions-only reporting hygiene: the
    * full per-query map still lands in BENCH_full.json and the detail
    * line; this only biases WHICH queries survive the 1800-char budget.
    */
  private val pinnedPrint: Set[String] = Set(
    "tpch_q3_top_orders", "tpch_q5_region_revenue", "parts_by_type_revenue",
    "by_sum", "coalesce_window", "ewma", "throttle", "dedup_minhash_lsh",
    "dedup_minhash_lsh_xx", "ann_ivf_topk", "dedup_simhash_near",
    "dedup_clusters", "ann_pq_topk", "semantic_dedup", "ann_sq8_topk",
    "bm25_topk", "tfidf_cosine_pairs", "ann_ivfpq_topk", "dedup_cross_corpus",
    "near_dup_stream_twin", "dsir_ratio_sum", "interleave_sources",
    "classifier_train", "frequent_ngrams", "ngram_lm_score",
    "ppl_bucket_counts", "host_pagerank", "cdx_roundtrip", "crawl_diff",
    "mirror_hosts", "kneser_ney_score", "stupid_backoff_score", "rank_fusion",
    "dedup_cluster_keep_best", "dedup_weighted_lsh", "dedup_weighted_jaccard",
    "zipf_fit", "dedup_weighted_cross", "el2n_scores", "kcenter_coreset",
    "cartography_stats", "ann_ivfpq_persisted", "dedup_jaccard_exact",
    "winnow_candidates", "dedup_edit_confirm", "bootstrap_means",
    "hits_scores", "ann_opq_identity", "ann_opq_persisted",
    "dedup_clusters_star", "incremental_dedup", "fuzzy_decontam",
    "rank_normalize", "ks_drift", "dup_rate_estimate", "bm25_persisted",
    "shared_substring_spans", "otlp_metrics_wire_decode", "cluster_split",
    "bm25_incremental", "ann_ivfpq_incremental", "substring_store_probe",
    "otlp_logs_wire_decode", "dedup_pair_eval", "dedup_pair_eval_sweep",
    "curation_e2e", "bpe_train", "bpe_encode", "lsh_cap_plan",
    "wordpiece_train", "wordpiece_encode")

  /** 1-min system load average — recorded at process start (ambient: the
    * box has documented multi-minute noisy-neighbor bursts that inflate
    * runs 2-10×) and at each pass boundary. During a pass our own
    * executors drive the load, so only the ambient value is a clean
    * pollution signal; per-pass values are emitted for transparency and
    * the steady-state stays "min over all passes" (inflation only ever
    * makes times larger, so the min is already the least-polluted pass).
    */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val ambientLoad = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev knob: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the headline list
    // (A/B runs isolating one query family); unset = full list. Tokens
    // are trimmed and unknown names fail fast — a typo must not emit a
    // healthy-looking zero-query total
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- headline.toSet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names not in headline: ${unknown.mkString(", ")}")
      require(o.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but names no queries")
    }
    val active = headline.filter(n => only.forall(_.contains(n)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The default generated-class cache (100 entries) thrashes across
      // 35 queries × 9 passes: every pass re-Janinos evicted classes,
      // churning the JVM code cache and queueing C2 recompiles — measured
      // as 3-18× inflation on mid-list queries (semantic_dedup 172s cold
      // in-bench vs 9.4s in a fresh JVM; sum_window 5.7s steady in-bench
      // vs 1.4s standalone). Static conf, must be set before the session.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // Host-speed calibration: tpch_q1 has been pinned, unchanged, since
    // round 1, so its isolated steady-state time is a pure host-speed
    // proxy — rounds are compared via times NORMALIZED by this number,
    // ending the every-round "regression or noisy host?" ambiguity
    // (burned rounds 8-10; the box swings ~2× between rounds). Measured
    // before the main passes: one warm-up run, then min of 3.
    val calib = {
      val q = qs("tpch_q1")
      try {
        q(spark, sfDir).count()
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); q(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch { case e: Throwable =>
        System.err.println(s"[bench] calib FAILED: ${e.getMessage}"); -1.0
      }
    }
    val errors = scala.collection.mutable.ListBuffer[String]()
    val passLoads = scala.collection.mutable.ListBuffer[(Double, Double)]()
    def pass(dir: String = sfDir): Seq[(String, Double)] = {
      val l0 = loadAvg()
      val r = passBody(dir)
      passLoads += ((l0, loadAvg()))
      r
    }
    def passBody(dir: String): Seq[(String, Double)] = active.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { qs(name)(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!errors.contains(name)) errors += name; false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // failed queries report negative time so they can't masquerade as
      // fast successes in the emitted JSON
      name -> (if (ok) secs else -secs)
    }
    // Three passes, JMH-style: the first run of each distinct query shape
    // pays one-time JVM costs — Janino compilation of its generated code,
    // C2 JIT of those classes (queued behind 32 busy cores), parquet
    // reader pools — measured at 3-15 s per query cold vs 0.5-2 s steady
    // state. The reference engine is a long-lived server, so steady-state
    // per-query time is the apples-to-apples number; the cold pass is
    // still reported (`cold_queries`) for transparency. Steady state =
    // per-query MIN of the two timed passes: C2 recompilation bursts land
    // on random queries mid-pass (observed: the same query 1.3 s in one
    // pass, 22 s in the next on an otherwise idle box), so a single timed
    // pass is noise-dominated; the min is the reproducible number.
    val cold = pass()
    val (warm1, warm2) = (pass(), pass())
    // steady state = min over ALL successful passes, cold included: a
    // cold time under both warm times means the warm passes were
    // noise-inflated (this box has multi-minute external load bursts —
    // observed the same query at 1.2s and 10.6s across runs), and every
    // pass is a genuinely observed execution. A query that failed in one
    // pass reports its best successful time (keeping its `errors` entry
    // for transparency); only a query that failed in every pass keeps a
    // negative marker
    val results = cold.zip(warm1.zip(warm2)).map { case ((n, c), ((_, a), (_, b))) =>
      val ok = Seq(c, a, b).filter(_ >= 0)
      n -> (if (ok.nonEmpty) ok.min else Seq(c, a, b).min)
    }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val coldTotal = cold.filter(_._2 >= 0).map(_._2).sum

    // Second scale point (SPARK_GRAFT_SF_DIR2, default sf0.01; disable
    // with an empty value): one warm pass per query at the second SF, and
    // a per-query time RATIO main/second. With ~10× the data between the
    // standard dirs, a healthy linear operator shows a ratio well under
    // 10 (fixed overhead amortizes); a ratio far ABOVE the data ratio
    // flags superlinear behavior — catching scale regressions by shape,
    // not by absolute seconds on whatever machine ran the bench.
    val sfDir2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    val (scaleSummary, scaleDetail) =
      if (sfDir2.isEmpty || sfDir2 == sfDir || !new java.io.File(sfDir2).isDirectory) ("", "")
      else {
        pass(sfDir2) // warm the second SF's query shapes/scans
        val small = pass(sfDir2).zip(pass(sfDir2)).map { case ((n, a), (_, b)) =>
          n -> (if (a >= 0 && b >= 0) math.min(a, b) else math.max(a, b))
        }
        val ratio = results.zip(small).collect {
          case ((n, big), (_, s)) if big >= 0 && s > 0 => n -> big / s
        }
        val sorted = ratio.map(_._2).sorted
        val median = if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2)
        val worst = if (ratio.isEmpty) "" -> 0.0 else ratio.maxBy(_._2)
        val summary =
          f""","scale_ratio":{"sf2":"$sfDir2","total2":${small.filter(_._2 >= 0).map(_._2).sum}%.3f,"ratio_median":$median%.3f,"ratio_worst":{"${worst._1}":${worst._2}%.3f}}"""
        val detail = f""","queries2":${json(small)},"ratio":${json(ratio)}"""
        (summary, detail)
      }
    // Two lines: a full-detail line first (cold per-query, second-SF
    // per-query, per-query ratios), then the driver-contract line LAST.
    // The driver captures only the final ~2000 chars of stdout and parses
    // the one JSON line it finds there, so the final line must stay small:
    // it carries per-query steady-state times plus summary scalars only
    // (round-3 lesson: inlining the per-query scale_ratio blocks pushed the
    // line past the capture window and the round lost its bench numbers).
    val loadsJson = passLoads.map { case (a, b) => f"[$a%.1f,$b%.1f]" }.mkString("[", ",", "]")
    // fixture fingerprints make driver-side testdata regeneration
    // self-announcing (identical block ⇒ cross-round numbers comparable)
    val fixtures = graft.sources.Fixtures.json(spark, sfDir)
    // Summary scalars (cold total, scale-probe summary, loads) ride at the
    // very END of the detail line: the driver keeps only the trailing
    // ~2000 chars of stdout, so the detail line's head (per-query cold/
    // second-SF maps) is sacrificial but these survive in the window just
    // above the contract line.
    val detailLine =
      f"""{"metric":"detail","cold_queries":${json(cold)}$scaleDetail,"fixtures":$fixtures,"pass_loads":$loadsJson,"cold_total":$coldTotal%.3f$scaleSummary,"calib":$calib%.3f,"load_ambient":$ambientLoad%.1f,"load_max":${passLoads.map(l => l._1 max l._2).max}%.1f}"""
    println(detailLine)
    def json2(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""\":$v%.2f""" }.mkString("{", ",", "}")
    def totalLine(queriesJson: String, omitted: Int): String = {
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$queriesJson$om,"calib":$calib%.3f,"errors":$errJson,"sf":"$sfDir"}"""
    }
    // Budget: the driver captures ~2000 trailing chars and the sbt
    // epilogue takes ~100, so 1800 is the safe ceiling. Degrade in steps
    // rather than die: 3-decimal map → 2-decimal map → 2-decimal map of
    // the SLOWEST queries only (the cheap tail is the least informative),
    // with an explicit queries_omitted marker. Full 3-decimal detail
    // always lives on the line above.
    // Drop order: UNPINNED fastest first, pinned only once no unpinned
    // query remains — prior-round printed queries (pinnedPrint) keep
    // printing, so the driver's diff sees rotation-free membership.
    val dropOrder = results.sortBy { case (n, v) => (pinnedPrint.contains(n), v) }
    val candidates = Iterator(
      totalLine(json(results), 0),
      totalLine(json2(results), 0)) ++
      Iterator.from(5).map { drop =>
        val dropped = dropOrder.take(drop).map(_._1).toSet
        val keep = results.filterNot(r => dropped.contains(r._1))
        totalLine(json2(keep), drop)
      }
    val contractLine = candidates.find(_.length <= 1800).get
    println(contractLine)
    // Reproducible capture: the driver keeps only the trailing ~2000
    // chars of stdout, which usually truncates the detail line's
    // per-query ratio map — so cross-round `bench_compare --scale`
    // claims were only re-derivable from uncommitted builder-side
    // captures. Write the FULL two-line capture to a file the repo can
    // commit (BENCH_full.json by default; override with
    // SPARK_GRAFT_BENCH_FULL, empty disables). Best-effort: a read-only
    // working dir must not fail the bench contract line.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_full.json")
    if (fullPath.nonEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (detailLine + "\n" + contractLine + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] full capture write failed: ${e.getMessage}") }
    spark.stop()
  }
}
