package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake (encoding-corruption) detection and repair — the ftfy-style
  * text-health pass every web corpus needs before tokenization.
  *
  * The dominant corruption on the web is UTF-8 bytes decoded as
  * cp1252/Latin-1: each non-ASCII codepoint's multi-byte UTF-8 sequence
  * decays into a characteristic 2-3 character artifact ("é" → "Ã©",
  * "’" → "â€™", "£" → "Â£"). Those artifact strings are vanishingly
  * rare in clean text (a capital Ã immediately followed by a symbol
  * char), so a fixed high-confidence dictionary both detects and —
  * because the misdecode is injective on this set — exactly repairs the
  * single-misdecode case, the overwhelming majority in practice
  * (ftfy's published "one decode step fixes most of the web" result).
  *
  * Scale shape: detection is ONE Aho-Corasick pass over the text (the
  * repo's [[MultiMatch]] codegen kernel — O(chars), not O(patterns ×
  * chars)); repair is a chained literal `replace`, map-side, inside
  * whole-stage codegen. No shuffle anywhere; a 100 TB corpus pays one
  * scan.
  *
  * The pair table is derived, not transcribed: MojibakeSpec rebuilds
  * every artifact by actually round-tripping the clean string through
  * `getBytes(UTF_8)` → `new String(bytes, windows-1252)` and asserts
  * the table matches — so the constants cannot drift from the encodings
  * they model. Pairs whose UTF-8 bytes hit cp1252's five undefined
  * slots (0x81 0x8D 0x8F 0x90 0x9D) are excluded: their misdecode is
  * not a printable string (e.g. the right double quote U+201D).
  */
object Mojibake {

  /** (artifact, repaired) pairs: the cp1252 misdecode of the UTF-8 bytes
    * of each clean character. Ordered longest-artifact-first so the
    * repair chain never splits a 3-char artifact by rewriting a 2-char
    * one inside it (no such nesting exists in this set, but the order
    * makes the invariant structural rather than accidental).
    */
  val DefaultRepairs: Seq[(String, String)] = Seq(
    // U+2018/2019 quotes, U+2013/2014 dashes, U+2026 ellipsis, U+20AC euro
    "â€™" -> "’", // â€™ → ’
    "â€˜" -> "‘", // â€˜ → ‘
    "â€œ" -> "“", // â€œ → “
    "â€“" -> "–", // â€“ → –
    "â€”" -> "—", // â€” → —
    "â€¦" -> "…", // â€¦ → …
    "â‚¬" -> "€", // â‚¬ → €
    "ï¿½" -> "�", // ï¿½ → U+FFFD (double-mangled replacement)
    // Latin-1 supplement letters (UTF-8 lead 0xC3)
    "Ã©" -> "é", // Ã© → é
    "Ã¨" -> "è", // Ã¨ → è
    "Ã¤" -> "ä", // Ã¤ → ä
    "Ã¶" -> "ö", // Ã¶ → ö
    "Ã¼" -> "ü", // Ã¼ → ü
    "Ã±" -> "ñ", // Ã± → ñ
    "Ã§" -> "ç", // Ã§ → ç
    // Latin-1 supplement symbols (UTF-8 lead 0xC2)
    "Â£" -> "£", // Â£ → £
    "Â©" -> "©", // Â© → ©
    "Â°" -> "°") // Â° → °

  /** Detection dictionary: the artifact strings plus the bare
    * replacement character (a decoder already marked those bytes lost —
    * unrepairable, but a strong corruption signal).
    */
  val DefaultArtifacts: Seq[String] = DefaultRepairs.map(_._1) :+ "�"

  /** Total artifact occurrences in `text` — one Aho-Corasick pass.
    * Null text counts 0 (totality over hostile corpora).
    */
  def hits(text: Column, patterns: Seq[String] = DefaultArtifacts): Column =
    MultiMatch.countOccurrences(coalesce(text, lit("")), patterns)

  /** Artifact occurrences per character — the thresholdable corruption
    * rate (artifacts are 1-3 chars, so the fraction is a rate, not an
    * exact char share; thresholds are tuned on the same definition).
    * Empty/null text scores 0. Integer numerator / integer-valued
    * denominator: the double division is bit-exact cross-engine.
    */
  def score(text: Column, patterns: Seq[String] = DefaultArtifacts): Column =
    when(length(coalesce(text, lit(""))) > 0,
      hits(text, patterns).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Undo a single UTF-8-as-cp1252 misdecode: chained literal replaces,
    * longest artifact first. Map-side, codegen'd, order-deterministic —
    * the identical chain replays in any engine with a `replace`.
    */
  def repair(text: Column, repairs: Seq[(String, String)] = DefaultRepairs): Column =
    repairs.foldLeft(text) { case (c, (bad, good)) => replace(c, lit(bad), lit(good)) }

  /** The filter-ready bundle: hit count, per-char rate, and a `keep`
    * verdict (corpora drop pages whose corruption rate exceeds
    * `maxScore`; 0 keeps only pristine pages).
    */
  def signals(text: Column, maxScore: Double = 0.001,
              patterns: Seq[String] = DefaultArtifacts): Column = {
    val h = hits(text, patterns)
    val s = score(text, patterns)
    struct(
      h.as("moji_hits"),
      s.as("moji_score"),
      (s <= maxScore).cast("long").as("keep"))
  }
}
