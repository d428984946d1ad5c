package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document-quality and repetition signals (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", appendix A1.1; also the C4 and
  * RefinedWeb filtering rules) as pure `Column` algebra.
  *
  * Scale design: every metric here is a SINGLE-PASS fold over the
  * document's own token array — no explode, no groupBy, no shuffle, no
  * UDF. A 100 TB corpus pays exactly one scan; the per-document state is
  * a constant-size struct accumulator inside whole-stage codegen. The
  * DuckDB oracle computes the same statistics relationally (unnest +
  * GROUP BY) — two independent formulations that must agree exactly
  * (integer counts; fractions are single divisions of exact longs, so
  * the doubles are bit-identical across engines).
  */
object Quality {

  /** Expression-level LET BINDING: evaluate `c` ONCE per row and feed the
    * bound value to every use inside `f` — `transform` over a 1-element
    * array, whose lambda variable IS the binding. Catalyst does not
    * common-subexpression-eliminate across higher-order-function lambda
    * boundaries (the [[ngrams]] scaladoc's measured 12× trap, and the
    * `minhashSignature` "project into a real column first" fix are both
    * this problem), and a composite like [[gopherSignals]] references its
    * token array from SIX sub-signals — without the binding each
    * reference re-runs the tokenizing regex split per row. Same values,
    * one evaluation (r16; gated by gopher_filter/text_quality/curation
    * staying hash-green).
    */
  private[graft] def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Space-joined word n-grams from a token array. Null-padded zip of
    * shifted slices (generalizes [[Text.bigramShingles]]): position i
    * yields `toks[i] .. toks[i+n-1]`, positions past `size-n` null out
    * through concat and are filtered.
    *
    * Built as an iterated `zip_with` of slices — NOT a `transform`
    * whose lambda indexes back into `toks` with `element_at`. The
    * distinction is a whole complexity class when the caller passes an
    * EXPRESSION (e.g. `Text.tokens(col)`) rather than a materialized
    * column: expressions inside a lambda body are re-evaluated per
    * ELEMENT (Catalyst cannot hoist across the lambda boundary, and
    * codegen subexpression elimination stops there too), so the
    * element_at form re-tokenized the document once per token —
    * O(tokens²) per row, measured 12× slower on the quality gate. Here
    * every lambda touches only its own arguments; `toks` appears a
    * bounded (≈2n) number of times outside lambdas, each evaluated
    * once per row.
    */
  def ngrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngrams: n must be >= 1, got $n")
    if (n == 1) toks
    else {
      val joined = (2 to n).foldLeft(toks) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k), greatest(size(toks) - (k - 1), lit(0))),
          (a, b) => concat(a, lit(" "), b))
      }
      filter(joined, g => g.isNotNull)
    }
  }

  /** Fraction of distinct tokens: `|set(toks)| / |toks|` (1.0 = no
    * repetition). 0.0 on empty documents.
    */
  def distinctTokenRatio(toks: Column): Column =
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** Total characters across an n-gram array (the denominators below). */
  private def gramChars(gs: Column): Column =
    aggregate(gs, lit(0L), (a, g) => a + length(g))

  /** Character fraction of the single most frequent n-gram:
    * `max_g count(g)*len(g) / sum_g len(g)` — Gopher's "fraction of
    * characters in the most common n-gram" rule (thresholds 0.20 / 0.18 /
    * 0.16 for n = 2 / 3 / 4).
    *
    * One pass over the SORTED gram array with a (prev, run, best) struct
    * accumulator: equal grams are adjacent after `array_sort`, so the
    * running count per gram is a run length and the max of
    * `run * len(gram)` is exact.
    */
  def topNgramCharFraction(toks: Column, n: Int): Column =
    // the sorted gram array feeds both the run fold and the denominator:
    // bind it once (it embeds the caller's token EXPRESSION, which would
    // otherwise be re-evaluated per reference — see [[bindOnce]])
    bindOnce(array_sort(ngrams(toks, n))) { gs =>
      val best = aggregate(
        gs,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, g) => {
          val run = when(g === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          struct(g.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run * length(g)).as("best"))
        },
        acc => acc.getField("best"))
      val total = gramChars(gs)
      when(total > 0, best.cast("double") / total.cast("double")).otherwise(lit(0.0))
    }

  /** Character fraction of n-grams that occur more than once:
    * `sum_{g: count(g)>1} count(g)*len(g) / sum_g len(g)` — Gopher's
    * "fraction of characters in duplicate n-grams" rule (n = 5..10).
    *
    * Same sorted-run fold: when a run reaches 2 the first occurrence is
    * retro-credited (`+2*len`), every further repeat adds `len`.
    */
  def dupNgramCharFraction(toks: Column, n: Int): Column =
    bindOnce(array_sort(ngrams(toks, n))) { gs =>
      val dup = aggregate(
        gs,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
        (acc, g) => {
          val run = when(g === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          val add = when(run === 2, lit(2L) * length(g))
            .when(run > 2, length(g).cast("long"))
            .otherwise(lit(0L))
          struct(g.as("prev"), run.as("run"), (acc.getField("dup") + add).as("dup"))
        },
        acc => acc.getField("dup"))
      val total = gramChars(gs)
      when(total > 0, dup.cast("double") / total.cast("double")).otherwise(lit(0.0))
    }

  /** Mean token length in characters (0.0 on empty documents). */
  def meanWordLength(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** Fraction of tokens containing at least one alphabetic character
    * (tokens are lowercased alnum runs, so `[a-z]` suffices).
    */
  def alphaWordFraction(toks: Column): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** Shannon entropy (nats) of the document's token distribution —
    * `H = ln n − (1/n)·Σ c·ln c` over per-token counts `c`. The
    * low-entropy tail is keyboard-mash / template spam (one token
    * repeated: H = 0); the high tail is ordinary prose (all-distinct:
    * H = ln n). A repetition signal that, unlike the fixed-n n-gram
    * fractions, needs no window-size choice.
    *
    * Single pass like everything here: sort the doc's own token array,
    * then ONE run-length fold accumulates `Σ c·ln c` (run boundaries
    * close runs; the finish lambda closes the last) — O(n log n) per
    * document inside codegen, no explode, no shuffle. Cross-engine the
    * `ln` sum is 1-ulp sensitive, so gates compare at DECIMAL(38,6)
    * (the repo's ln convention). Empty docs score 0.
    */
  def tokenEntropy(toks: Column): Column = {
    def cLnC(run: Column): Column =
      run.cast("double") * log(run.cast("double"))
    val folded = aggregate(
      array_sort(toks),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0.0).as("acc")),
      (a, t) => struct(
        t.as("prev"),
        when(t === a.getField("prev"), a.getField("run") + 1L)
          .otherwise(lit(1L)).as("run"),
        when(a.getField("prev").isNotNull && t =!= a.getField("prev"),
          a.getField("acc") + cLnC(a.getField("run")))
          .otherwise(a.getField("acc")).as("acc")),
      a => a.getField("acc") +
        when(a.getField("run") > 0L, cLnC(a.getField("run"))).otherwise(lit(0.0)))
    when(size(toks) > 0,
      log(size(toks).cast("double")) - folded / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Count of distinct English stopwords present (Gopher's "has at least
    * 2 stop words" rule; shares [[Text.LangStopwords]]'s `en` set).
    */
  def stopwordCount(toks: Column): Column = {
    val en = Text.LangStopwords.toMap.apply("en")
    size(array_intersect(toks, array(en.map(lit): _*))).cast("long")
  }

  /** Hashed linear quality-classifier score — the Spark-side plumbing of
    * fastText-style classifier filtering (CCNet; GPT-3's LR filter): each
    * token hashes to a deterministic pseudo-weight in [-1000, 1000], the
    * score is the mean weight scaled to [-1, 1]. The WEIGHTS are an
    * honest stand-in (a trained model would ship its table and look up
    * exactly like this — one hash + one arithmetic fold per token, no
    * shuffle); the plumbing, determinism, and thresholding behavior are
    * real. Thresholding this mean is monotone-equivalent to thresholding
    * a sigmoid of it, so no transcendental function has to match across
    * engines. Integer numerator → the double division is bit-exact in
    * any IEEE engine.
    */
  def classifierScore(text: Column, salt: String = "qw"): Column = {
    val toks = Text.tokens(text)
    val num = aggregate(toks, lit(0L), (a, t) =>
      a + (pmod(Text.md5Hash64(concat_ws(":", lit(salt), t)), lit(2001L)) - 1000L))
    when(size(toks) > 0,
      num.cast("double") / (size(toks).cast("double") * 1000.0))
      .otherwise(lit(0.0))
  }

  /** Heuristic English syllable count for one lowercase token: vowel
    * groups (`[aeiouy]+` runs), minus one for a silent final 'e' (ends
    * in 'e' but not 'le', and has another vowel group to carry the
    * syllable), floored at 1 — the standard automated-readability
    * approximation (Flesch 1948 tooling; Talburt 1985). Everything is a
    * plain regexp count inside codegen; no lookup table ships.
    */
  def syllables(tok: Column): Column = {
    val groups = regexp_count(tok, lit("[aeiouy]+")).cast("long")
    val silentE = when(
      tok.endsWith("e") && !tok.endsWith("le") && groups > 1L, lit(1L))
      .otherwise(lit(0L))
    greatest(groups - silentE, lit(1L))
  }

  /** Readability bundle over raw text: word / sentence / syllable counts
    * plus Flesch Reading Ease (`206.835 − 1.015·W/S − 84.6·Syl/W`) and
    * the Flesch-Kincaid grade level (`0.39·W/S + 11.8·Syl/W − 15.59`) —
    * the length-free prose-complexity signal quality filters pair with
    * the Gopher rules (too-low FRE = legalese/boilerplate, too-high on
    * long pages = word-salad). Sentences are `[.!?]+` runs in the raw
    * text, floored at 1 (headlines are one sentence, not zero). One
    * arithmetic fold per document, map-side, no shuffle. Empty docs
    * score 0 on both indices.
    */
  def readabilitySignals(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val toks = Text.tokens(t)
    val nWords = size(toks).cast("long")
    val nSents = greatest(
      regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
    val nSyl = aggregate(toks, lit(0L), (a, t) => a + syllables(t))
    val wps = nWords.cast("double") / nSents.cast("double")
    val spw = nSyl.cast("double") / nWords.cast("double")
    val fre = when(nWords > 0L,
      lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).otherwise(lit(0.0))
    val fk = when(nWords > 0L,
      lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).otherwise(lit(0.0))
    struct(
      nWords.as("n_words"),
      nSents.as("n_sentences"),
      nSyl.as("n_syllables"),
      fre.as("fre"),
      fk.as("fk_grade"))
  }

  /** Gopher rule bundle over a raw text column: the individual signals
    * plus a `keep` verdict, as a struct. Word-count bounds are scaled to
    * the fixture corpus (the published 50..100k assumes web pages); every
    * threshold is a parameter so production corpora set their own.
    */
  def gopherSignals(
      text: Column,
      minWords: Int = 20,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      maxTop2Frac: Double = 0.20,
      maxDup3Frac: Double = 0.60): Column = {
    // bind the token array once: six sub-signals reference it, and
    // without the binding each reference re-runs the tokenizing regex
    // split per row (lambda boundaries defeat CSE — [[bindOnce]]); then
    // bind the signal struct once so `keep`'s six threshold reads don't
    // re-fold the signals
    val sig = bindOnce(Text.tokens(text)) { toks =>
      struct(
        size(toks).cast("long").as("n_words"),
        meanWordLength(toks).as("mean_word_len"),
        alphaWordFraction(toks).as("alpha_frac"),
        stopwordCount(toks).as("stop_hits"),
        topNgramCharFraction(toks, 2).as("top2_frac"),
        dupNgramCharFraction(toks, 3).as("dup3_frac"))
    }
    bindOnce(sig) { s =>
      val keep = s.getField("n_words").between(minWords, maxWords) &&
        s.getField("mean_word_len").between(minMeanLen, maxMeanLen) &&
        s.getField("alpha_frac") >= minAlphaFrac &&
        s.getField("stop_hits") >= minStopwords &&
        s.getField("top2_frac") <= maxTop2Frac &&
        s.getField("dup3_frac") <= maxDup3Frac
      struct(
        s.getField("n_words").as("n_words"),
        s.getField("mean_word_len").as("mean_word_len"),
        s.getField("alpha_frac").as("alpha_frac"),
        s.getField("stop_hits").as("stop_hits"),
        s.getField("top2_frac").as("top2_frac"),
        s.getField("dup3_frac").as("dup3_frac"),
        keep.cast("long").as("keep"))
    }
  }
}
