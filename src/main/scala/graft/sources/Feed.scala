package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RSS 2.0 / Atom feed parsing — the push-advertised half of crawl
  * discovery next to [[Sitemap]] (site-advertised) and [[Robots]]
  * (permission): feeds carry the freshest URLs a site publishes, which
  * is why production crawlers poll them between sitemap sweeps.
  *
  * Same engineering rules as [[Sitemap]]: Spark-native `from_xml`
  * against explicit schemas + `inline` explode — map-side, no scalar
  * UDF, no driver DOM, total on malformed XML (an unparseable body
  * yields zero rows, not a failed task). Dates stay strings (RFC 822 /
  * RFC 3339 as published); parsing them is the caller's policy.
  */
object Feed {

  private val RssItem = StructType(Seq(
    StructField("link", StringType),
    StructField("title", StringType),
    StructField("pubDate", StringType),
    StructField("guid", StringType)))

  private val RssSchema = StructType(Seq(
    StructField("channel", StructType(Seq(
      StructField("item", ArrayType(RssItem)))))))

  // Atom <link href=".."/> is attribute-carried; native from_xml maps
  // attributes with the "_" prefix. Multiple link elements per entry
  // (rel=self/alternate/...) parse as an array.
  private val AtomLink = StructType(Seq(
    StructField("_href", StringType),
    StructField("_rel", StringType)))

  private val AtomEntry = StructType(Seq(
    StructField("link", ArrayType(AtomLink)),
    StructField("title", StringType),
    StructField("updated", StringType),
    StructField("id", StringType)))

  private val AtomSchema = StructType(Seq(
    StructField("entry", ArrayType(AtomEntry))))

  /** Explode RSS 2.0 bodies into one row per `<item>`: original columns
    * survive; `url`, `title`, `published`, `entry_id` appended (absent
    * children null). Non-RSS bodies contribute no rows.
    */
  def parseRss(df: DataFrame, xmlCol: String = "xml"): DataFrame =
    df
      .withColumn("__r", from_xml(col(xmlCol), RssSchema))
      .select(col("*"), inline(col("__r.channel.item")))
      .drop("__r")
      .withColumnRenamed("link", "url")
      .withColumnRenamed("pubDate", "published")
      .withColumnRenamed("guid", "entry_id")

  /** The per-entry Atom URL: the first `rel="alternate"` link, else the
    * first link with no rel (the spec's implied alternate), else the
    * first link of any kind.
    */
  private def atomUrl(links: Column): Column = {
    // try_element_at, not element_at: a rel class with no match is an
    // EMPTY array and ANSI element_at throws on index 1 — null is the
    // correct "no such link" answer for coalesce to fall through
    def firstHref(pred: Column => Column): Column =
      try_element_at(transform(filter(links, l => pred(l.getField("_rel"))),
        _.getField("_href")), lit(1))
    coalesce(
      firstHref(r => r === "alternate"),
      firstHref(r => r.isNull),
      try_element_at(transform(links, _.getField("_href")), lit(1)))
  }

  /** Explode Atom bodies into one row per `<entry>`: `url` (resolved by
    * the alternate-link rule), `title`, `published` (`<updated>`),
    * `entry_id` (`<id>`). Non-Atom bodies contribute no rows.
    */
  def parseAtom(df: DataFrame, xmlCol: String = "xml"): DataFrame =
    df
      .withColumn("__a", from_xml(col(xmlCol), AtomSchema))
      .select(col("*"), explode(col("__a.entry")).as("__e"))
      .select(col("*"),
        atomUrl(col("__e.link")).as("url"),
        col("__e.title").as("title"),
        col("__e.updated").as("published"),
        col("__e.id").as("entry_id"))
      .drop("__a", "__e")

  /** Feed AUTODISCOVERY from HTML pages (the RSS/Atom convention every
    * browser and crawler honors): hrefs of
    * `<link rel="alternate" type="application/rss+xml|atom+xml">` tags.
    * Attributes appear in ANY order with any quoting — rel, type and
    * href each accept double-quoted, single-quoted AND unquoted values
    * (all legal HTML) — so the extraction is tag-scan →
    * predicate-filter → href-extract array algebra (six permutation
    * regexes would be the fragile alternative) — one map-side
    * projection, total on non-HTML. Returns an array column of
    * discovered feed URLs (empty when the page advertises none).
    */
  def discoveryLinks(html: Column): Column = {
    val tags = regexp_extract_all(html, lit("(?i)<link\\s[^>]*>"), lit(0))
    // quoted hrefs may contain spaces; unquoted ones end at whitespace,
    // a quote or the tag close — try the quoted form first
    def href(t: Column): Column = {
      val quoted = regexp_extract(t, "(?i)href\\s*=\\s*[\"']([^\"'>]+)[\"']", 1)
      val bare = regexp_extract(t, "(?i)href\\s*=\\s*([^\\s\"'>][^\\s\"'>]*)", 1)
      when(quoted =!= "", quoted).otherwise(bare)
    }
    filter(
      transform(
        filter(tags, t =>
          t.rlike("(?i)rel\\s*=\\s*[\"']?alternate") &&
            t.rlike("(?i)type\\s*=\\s*[\"']?application/(rss|atom)\\+xml")),
        t => href(t)),
      h => h =!= "")
  }

  /** Total feed-date parse: RFC 822 (RSS `pubDate`) and RFC 3339 / ISO
    * 8601 (Atom `updated`) strings → event-time NANOSECONDS (the Event
    * model's `time` unit), null on anything unparseable — never throws,
    * so a crawl of hostile feeds can't fail a task. Covers the wild
    * forms that dominate real feeds: optional weekday prefix, 1-2 digit
    * days, named (GMT/UTC/...) and numeric (+0200) zones, seconds
    * optional, ISO offsets and fractional seconds. Sub-microsecond
    * fractions truncate (Spark timestamps are µs). Pure column algebra
    * (`try_to_timestamp` cascade) — map-side, codegen'd.
    */
  def eventTime(published: Column): Column = {
    // RFC 822's leading "Mon, " is optional and its weekday is
    // redundant (the date determines it) — strip it instead of parsing
    // it, which also forgives feeds that get the weekday wrong. The
    // obsolete-but-legal "UT" zone token (RFC 822 §5.1) normalizes to
    // GMT, which the zzz pattern parses.
    val s = regexp_replace(
      regexp_replace(trim(published), "^[A-Za-z]{3},\\s*", ""),
      "\\bUT$", "GMT")
    val ts = coalesce(
      try_to_timestamp(s),                                  // ISO / RFC 3339
      try_to_timestamp(s, lit("d MMM yyyy HH:mm:ss Z")),    // +0200
      try_to_timestamp(s, lit("d MMM yyyy HH:mm:ss zzz")),  // GMT / UTC
      try_to_timestamp(s, lit("d MMM yyyy HH:mm Z")),
      try_to_timestamp(s, lit("d MMM yyyy HH:mm zzz")),
      try_to_timestamp(s, lit("d MMM yy HH:mm:ss Z")),
      try_to_timestamp(s, lit("d MMM yy HH:mm:ss zzz")))
    (unix_micros(ts) * lit(1000L)).as("time")
  }

  /** Append the Event model's ns `time` column parsed from a feed's
    * published/updated string ([[eventTime]]; null on garbage) — the
    * glue that lets [[parseFeeds]] rows enter windows/throttles/EWMAs
    * directly.
    */
  def withEventTime(df: DataFrame, publishedCol: String = "published",
                    out: String = "time"): DataFrame =
    df.withColumn(out, eventTime(col(publishedCol)))

  /** Format-sniffing union: each body routes to the RSS or Atom parser
    * by its root element, with `feed_type` tagging the rows. One body
    * parses at most once (a document can't be both); unparseable bodies
    * contribute nothing. Two map-side projections over the same scan —
    * at crawl scale the frame is millions of small bodies and the whole
    * pass is still shuffle-free.
    */
  def parseFeeds(df: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val root = regexp_extract(col(xmlCol), "<\\s*([A-Za-z]+)", 1)
    val rss = parseRss(df.filter(lower(root) === "rss"), xmlCol)
      .withColumn("feed_type", lit("rss"))
    val atom = parseAtom(df.filter(lower(root) === "feed"), xmlCol)
      .withColumn("feed_type", lit("atom"))
    rss.unionByName(atom)
  }
}
