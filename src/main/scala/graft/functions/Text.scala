package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, token counting and document
  * fingerprinting. All pure `Column` algebra — codegen'd, no UDFs — so
  * they pipeline into scans and cost one pass at any scale.
  *
  * Hash discipline: [[polyHash]] is a cross-engine-reproducible polynomial
  * hash (the DuckDB oracle computes the identical fold); production paths
  * that don't need oracle parity should prefer the codegen'd `xxhash64`.
  */
object Text {

  /** Lowercase word tokens (alnum runs). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-style pre-tokenization pattern — the GPT-2 splitter's shape
    * (letter runs / digit runs / punctuation runs, each with an optional
    * leading space, plus whitespace runs) restricted to the regex subset
    * both Java regex and RE2 (the DuckDB oracle) execute identically:
    * no lookahead, no unicode classes. A real tokenizer would then merge
    * within these pre-tokens; their count is the standard cheap proxy
    * for "how many BPE tokens is this document" (within ~15% of GPT-2
    * counts on English text).
    */
  val BpePretokenPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"

  /** Pre-token count under [[BpePretokenPattern]] — the BPE-ish token
    * budget estimator ([[tokenCount]] is the whitespace-word twin).
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePretokenPattern), lit(0))).cast("long")

  /** Deterministic polynomial string hash: fold of `acc*31 + codepoint`
    * mod 1e9+7. Reproducible in any engine with a list fold — but it
    * materializes one single-char string per character; use [[md5Hash64]]
    * on hot paths.
    */
  def polyHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(1000000007L))

  /** Fast deterministic 60-bit hash: the first 15 hex chars of md5,
    * parsed as an integer. One codegen'd md5 call per string — no
    * per-character arrays — and still engine-portable: any engine with
    * md5 can fold the hex prefix to the identical integer.
    */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[md5Hash64]] reduced mod 1e9+7 — drop-in for [[polyHash]] where the
    * downstream does modular permutation arithmetic (MinHash).
    */
  def md5HashMod(c: Column): Column = md5Hash64(c) % lit(1000000007L)

  /** Harman "s-stemmer" (Donna Harman, "How Effective Is Suffixing?",
    * JASIS 1991) — the minimal English plural stemmer production
    * retrieval stacks reach for when full Porter over-stems (Lucene's
    * minimal-English family is the same idea): exactly three guarded
    * rules, applied first-match on a lowercase token:
    *
    *  1. `-ies → -y` unless the word ends `-eies`/`-aies`
    *  2. `-es  → -e` (drop the `s`) unless it ends `-aes`/`-ees`/`-oes`
    *  3. `-s` dropped unless the word ends `-us`/`-ss`
    *
    * Pure CASE/substr algebra — codegen'd, engine-portable (the DuckDB
    * oracle replays the identical rules), no dictionary. Feed it
    * [[tokens]] output; conflating plural/singular raises recall in
    * BM25/tf-idf retrieval at near-zero precision cost.
    */
  def sStem(c: Column): Column =
    // branch on the LONGEST suffix first; an exception means the word is
    // left unchanged, not passed to the next rule ("toes" stays "toes",
    // it does not fall through to the bare-s rule)
    when(c.endsWith("eies") || c.endsWith("aies"), c)
      .when(c.endsWith("ies"), concat(c.substr(lit(1), length(c) - 3), lit("y")))
      .when(c.endsWith("aes") || c.endsWith("ees") || c.endsWith("oes"), c)
      .when(c.endsWith("es"), c.substr(lit(1), length(c) - 1))
      .when(c.endsWith("us") || c.endsWith("ss"), c)
      .when(c.endsWith("s"), c.substr(lit(1), length(c) - 1))
      .otherwise(c)

  /** Word n-gram shingles (n=2): null-padded zip of the token array with
    * its own tail, nulls filtered.
    */
  def bigramShingles(toks: Column): Column =
    filter(
      zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)

  /** Document fingerprint: md5 over the sorted distinct token set — the
    * classic key-collapsing fingerprint (same token multiset order-free).
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** Stopword sets used by the language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*))).cast("long")

  /** n-gram/stopword language-ID heuristic: score = distinct stopword hits
    * per language, argmax with fixed precedence order, `und` (undetermined)
    * when nothing matches.
    */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangStopwords.map { case (lang, ws) => lang -> stopwordHits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Unicode script ranges (BMP blocks) for [[scriptProfile]] — one
    * source of truth both engines' character classes are generated
    * from. Latin is its two ASCII letter runs; the CJK entry is the
    * Unified Ideographs block; kana covers hiragana + katakana.
    */
  val ScriptRanges: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq(0x41 -> 0x5A, 0x61 -> 0x7A),
    "cyrillic" -> Seq(0x400 -> 0x4FF),
    "greek" -> Seq(0x370 -> 0x3FF),
    "arabic" -> Seq(0x600 -> 0x6FF),
    "hebrew" -> Seq(0x590 -> 0x5FF),
    "devanagari" -> Seq(0x900 -> 0x97F),
    "cjk" -> Seq(0x4E00 -> 0x9FFF),
    "hangul" -> Seq(0xAC00 -> 0xD7AF),
    "kana" -> Seq(0x3040 -> 0x30FF))

  /** Java-regex character class for one script (for `regexp_count`). */
  private def scriptClass(ranges: Seq[(Int, Int)]): String =
    ranges.map { case (lo, hi) => f"\\x{$lo%04X}-\\x{$hi%04X}" }.mkString("[", "", "]")

  /** RE2 (DuckDB) character class for one script — same ranges, RE2's
    * `\x{...}` spelling; exposed so the oracle is generated from the
    * identical table.
    */
  def scriptClassRe2(name: String): String =
    ScriptRanges.toMap.apply(name)
      .map { case (lo, hi) => f"\\x{$lo%04X}-\\x{$hi%04X}" }.mkString("[", "", "]")

  /** Writing-script profile — the multilingual-corpus signal langid's
    * stopword heuristic can't give (stopword lists are per-LANGUAGE;
    * script is per-CHARACTER and catches mixed-script spam, wrong-script
    * boilerplate, and transliteration artifacts): per-script character
    * counts over the BMP block table plus the dominant script (`argmax`
    * count, ties to table order, `unknown` when no scripted character
    * occurs). One `regexp_count` per script inside codegen — map-side,
    * zero shuffle, and exactly replayable (RE2 spells the same class
    * via [[scriptClassRe2]]).
    */
  def scriptProfile(c: Column): Column = {
    val t = coalesce(c, lit(""))
    val counts = ScriptRanges.map { case (name, ranges) =>
      name -> regexp_count(t, lit(scriptClass(ranges))).cast("long")
    }
    val best = counts.map(_._2).reduce(greatest(_, _))
    val script = counts.foldRight(lit("unknown"): Column) {
      case ((name, cnt), acc) => when(cnt === best && best > 0L, lit(name)).otherwise(acc)
    }
    struct(counts.map { case (name, cnt) => cnt.as(s"n_$name") } :+
      script.as("script"): _*)
  }

  /** Control characters (C0 + DEL) — the cleanup targets of
    * [[normalize]]. Written as explicit hex ranges (no `\p{Cntrl}`,
    * which RE2 — the DuckDB oracle's engine — spells differently).
    */
  val ControlCharPattern = "[\\x00-\\x1f\\x7f]"

  /** Text normalization — the standard pre-tokenization cleanup pass
    * (C4/CCNet shape): control chars (tabs/newlines included) become
    * spaces, space runs collapse to one, ends are trimmed, and
    * optionally the text is lowercased. Pure `regexp_replace` chain —
    * codegen'd, fuses into the scan, zero shuffles at any scale.
    */
  def normalize(c: Column, lowercase: Boolean = false): Column = {
    val noCtrl = regexp_replace(c, ControlCharPattern, " ")
    val collapsed = regexp_replace(noCtrl, " {2,}", " ")
    val trimmed = regexp_replace(regexp_replace(collapsed, "^ ", ""), " $", "")
    if (lowercase) lower(trimmed) else trimmed
  }

  /** HTML-ish markup strip — the web-corpus text-extraction cleanup:
    * tags (`<...>`) become spaces, the five predefined entities unescape
    * (`&amp;` LAST, the single-pass convention — `&amp;lt;` yields the
    * literal `&lt;`, never a second round of unescaping), then
    * [[normalize]] collapses the leftover whitespace. A real boilerplate
    * extractor (trafilatura-class DOM scoring) is out of regex reach; this
    * is the standard cheap pass that precedes or replaces it at scale.
    * Pure codegen'd column algebra, zero shuffles.
    */
  def stripHtml(c: Column, lowercase: Boolean = false): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    normalize(unescaped, lowercase)
  }

  /** Quality score in [0,1]: blend of length band, mean token length band
    * and alpha ratio. Deterministic double arithmetic (identical fold in
    * the oracle).
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val toks = tokens(c)
    val nToks = size(toks).cast("double")
    val meanTokLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks).otherwise(lit(0.0))
    val lengthScore = least(nChars / lit(200.0), lit(1.0))
    val tokLenScore = when(meanTokLen >= 3 && meanTokLen <= 8, lit(1.0)).otherwise(lit(0.5))
    val densityScore = when(nToks > 0, least(nToks / lit(40.0), lit(1.0))).otherwise(lit(0.0))
    (lengthScore * lit(0.4) + tokLenScore * lit(0.3) + densityScore * lit(0.3))
  }
}
