package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction and URL analysis for training-data scrubbing.
  *
  * Every pattern below is written in the common subset of Java regex
  * (Spark) and RE2 (DuckDB, the correctness oracle): character classes,
  * bounded repetition and `\b` word boundaries only — no backreferences,
  * no lookaround — so the two engines match the identical spans and the
  * redacted output hash-matches byte for byte.
  *
  * Scale design: pure `regexp_replace`/`regexp_extract_all` column
  * algebra — codegen'd, fuses into the scan, zero shuffles for the
  * per-document pass; only the domain-stats aggregate shuffles (once, on
  * the domain key).
  */
object Pii {

  /** The shared patterns (kept in one place so the oracle SQL builders in
    * the query suite cite the same strings).
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val UrlHostPattern = "https?://([a-z0-9.-]+)"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailPattern), lit(0))).cast("long")
  def ipCount(c: Column): Column = size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0))).cast("long")
  def phoneCount(c: Column): Column = size(regexp_extract_all(c, lit(PhonePattern), lit(0))).cast("long")

  /** Replace emails, IPv4s and phone numbers with typed placeholder
    * tokens. Order matters and is pinned: emails first (an email's host
    * part could otherwise be clipped by the IP rule), then IPs, then
    * phones — the oracle applies the same order.
    */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EmailPattern, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Pattern, "<IP>")
    regexp_replace(i, PhonePattern, "<PHONE>")
  }

  /** All URL hosts mentioned in a text column, in occurrence order. */
  def urlHosts(c: Column): Column =
    regexp_extract_all(c, lit(UrlHostPattern), lit(1))

  /** HTML anchor targets: the `href` value of every `<a …>` tag (single
    * or double quoted, case-insensitive, attribute order free) in
    * document order — the crawl-frontier / link-graph unit where
    * [[urlHosts]] only catches PLAIN-TEXT mentions. Kept in the
    * Java/RE2 common regex subset so the oracle replays it; a real DOM
    * parser is deliberately out of scope (the totality rule: malformed
    * markup yields fewer links, never failed tasks).
    */
  val HrefPattern = "(?i)<a\\s[^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"']"

  def hrefTargets(c: Column): Column =
    regexp_extract_all(c, lit(HrefPattern), lit(1))

  /** `<link rel="canonical" href="…">` target — the page's OWN
    * statement of which URL is authoritative, the strongest URL-level
    * dup signal a crawl carries (CMS mirrors, tracking-parameter
    * variants and pagination shells all point at one canonical; dedup
    * pipelines collapse on it BEFORE any content hashing). Attribute
    * order free (`rel` before or after `href`), both quote styles,
    * first match wins; empty string when the page declares none.
    */
  val CanonicalPattern =
    "(?i)<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"'][^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"']"
  private val CanonicalPatternRev =
    "(?i)<link\\s[^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"'][^>]*rel\\s*=\\s*[\"']canonical[\"']"

  def canonicalTarget(c: Column): Column = {
    val t = coalesce(c, lit(""))
    val fwd = regexp_extract(t, CanonicalPattern, 1)
    when(fwd =!= "", fwd).otherwise(regexp_extract(t, CanonicalPatternRev, 1))
  }

  /** `<title>` text (first match, tags inside not unescaped — compose
    * with [[graft.functions.Text.stripHtml]] for entity handling).
    */
  val TitlePattern = "(?i)<title[^>]*>([^<]*)</title>"

  def htmlTitle(c: Column): Column =
    regexp_extract(coalesce(c, lit("")), TitlePattern, 1)

  /** Tracking query parameters dropped by [[canonicalizeUrl]] — the
    * analytics/click-id params that make the same page look like millions
    * of distinct URLs (the standard pre-dedup normalization cut).
    */
  val TrackingParamPattern = "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref)="

  /** Canonicalize a single-URL column for URL-level dedup:
    *
    *  1. drop the `#fragment`,
    *  2. lowercase scheme + host (path/query case is significant and
    *     kept),
    *  3. strip default ports (`http://…:80`, `https://…:443`),
    *  4. drop tracking params ([[TrackingParamPattern]]) and SORT the
    *     survivors — `?b=2&a=1` and `?a=1&b=2` are the same resource,
    *  5. drop the bare `?` when nothing survives.
    *
    * Non-URL strings (no `http(s)://` prefix) pass through unchanged, so
    * the pass is total on dirty crawl metadata. Pure column algebra
    * (regex + array ops, codegen'd, zero shuffle) in the Java/RE2 common
    * subset — the DuckDB oracle replays every rule.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val prefix = regexp_extract(noFrag, "^([a-zA-Z]+://[^/?]+)", 1)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val lowered = lower(prefix)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^:/?]+):80$", "$1"),
      "^(https://[^:/?]+):443$", "$1")
    val qPos = instr(rest, "?")
    val path = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val query = when(qPos > 0, rest.substr(qPos + 1, length(rest))).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern)))
    val canonical = concat(noPort, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit("")))
    when(lowered.startsWith("http://") || lowered.startsWith("https://"), canonical)
      .otherwise(u)
  }

  /** Registrable domain of a host: the last `levels` dot-labels (default
    * 2, e.g. `a.b.example.org` → `example.org`). Label-count aware —
    * shorter hosts pass through whole.
    */
  def registrableDomain(host: Column, levels: Int = 2): Column = {
    val labels = split(host, "\\.")
    concat_ws(".", slice(labels, greatest(size(labels) - (levels - 1), lit(1)), lit(levels)))
  }
}
