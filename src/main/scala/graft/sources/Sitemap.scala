package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** sitemaps.org XML parsing — the discovery half of a crawl frontier
  * next to [[Robots]] (which advertises sitemaps via `Sitemap:` lines)
  * and [[Cdx]] (which records what was actually fetched): `<urlset>`
  * documents carry the fetchable URLs with freshness hints, and
  * `<sitemapindex>` documents fan out to child sitemaps.
  *
  * Parsing is Spark's native `from_xml` against an explicit schema (no
  * scalar UDF, no DOM on the driver) followed by an `inline` explode —
  * map-side, one row per `<url>` entry, total on malformed XML (a body
  * that doesn't parse yields zero entries, not a failed task). At crawl
  * scale a sitemap fetch frame is millions of small XML bodies; the
  * whole pass stays inside one projection with no shuffle.
  */
object Sitemap {

  private val UrlEntry = StructType(Seq(
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority", DoubleType)))

  private val UrlsetSchema = StructType(Seq(
    StructField("url", ArrayType(UrlEntry))))

  private val IndexEntry = StructType(Seq(
    StructField("loc", StringType),
    StructField("lastmod", StringType)))

  private val IndexSchema = StructType(Seq(
    StructField("sitemap", ArrayType(IndexEntry))))

  /** Explode `<urlset>` bodies into one row per `<url>` entry —
    * original columns survive, `loc`/`lastmod`/`changefreq`/`priority`
    * appended (absent child elements null). Bodies that are not a
    * parseable urlset contribute no rows.
    */
  def parseUrlset(df: DataFrame, xmlCol: String = "xml"): DataFrame =
    df
      .withColumn("__u", from_xml(col(xmlCol), UrlsetSchema))
      .select(col("*"), inline(col("__u.url")))
      .drop("__u")

  /** Explode `<sitemapindex>` bodies into one row per child `<sitemap>`
    * entry (`loc`, `lastmod`). */
  def parseIndex(df: DataFrame, xmlCol: String = "xml"): DataFrame =
    df
      .withColumn("__i", from_xml(col(xmlCol), IndexSchema))
      .select(col("*"), inline(col("__i.sitemap")))
      .drop("__i")

  /** `Sitemap:` URLs advertised in a robots.txt body — per RFC 9309
    * these live outside agent groups and apply crawl-wide. */
  def fromRobots(text: String): Seq[String] =
    text.stripPrefix("\uFEFF").linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(c + 1).trim).filter(_.nonEmpty)
      else None
    }.toSeq
}
