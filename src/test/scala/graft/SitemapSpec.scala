package graft

import graft.sources.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** sitemaps.org parsing: urlset entries, sitemapindex fan-out,
  * totality on malformed XML, robots `Sitemap:` discovery, IR actions.
  * The XML round trip is oracle-gated (`sitemap_urls`).
  */
class SitemapSpec extends AnyFunSuite {
  import TestSpark.spark

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>http://e.com/a</loc><lastmod>2024-01-02</lastmod>
      |    <changefreq>daily</changefreq><priority>0.8</priority></url>
      |  <url><loc>http://e.com/b</loc></url>
      |</urlset>""".stripMargin

  test("parseUrlset: entries with and without optional fields") {
    val s = spark
    import s.implicits._
    val out = Sitemap.parseUrlset(Seq(("m1", urlset)).toDF("id", "xml"))
      .drop("xml").orderBy("loc").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("id") == "m1")
    assert(out(0).getAs[String]("loc") == "http://e.com/a")
    assert(out(0).getAs[String]("lastmod") == "2024-01-02")
    assert(out(0).getAs[String]("changefreq") == "daily")
    assert(out(0).getAs[Double]("priority") == 0.8)
    assert(out(1).getAs[String]("loc") == "http://e.com/b")
    assert(out(1).isNullAt(out(1).fieldIndex("priority")))
  }

  test("parseUrlset: malformed or non-sitemap XML contributes no rows") {
    val s = spark
    import s.implicits._
    val out = Sitemap.parseUrlset(Seq(
      ("bad", "<urlset><url><loc>unclosed"),
      ("other", "<html><body>not a sitemap</body></html>"),
      ("empty", "")).toDF("id", "xml"))
    assert(out.count() == 0)
  }

  test("parseIndex: sitemapindex fan-out") {
    val s = spark
    import s.implicits._
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>http://e.com/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
        |  <sitemap><loc>http://e.com/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemap.parseIndex(Seq(idx).toDF("xml")).drop("xml")
      .orderBy("loc").collect()
    assert(out.map(_.getAs[String]("loc")).toSeq
      == Seq("http://e.com/s1.xml", "http://e.com/s2.xml"))
    assert(out(0).getAs[String]("lastmod") == "2024-02-01")
  }

  test("fromRobots: crawl-wide Sitemap lines, outside any group") {
    val robots =
      """User-agent: *
        |Disallow: /x
        |Sitemap: http://e.com/sitemap.xml
        |# comment
        |sitemap: http://e.com/other.xml  # trailing comment
        |Sitemap:
        |""".stripMargin
    assert(Sitemap.fromRobots(robots)
      == Seq("http://e.com/sitemap.xml", "http://e.com/other.xml"))
    assert(Sitemap.fromRobots("no directives here").isEmpty)
  }

  test("sitemap-urls / sitemap-index are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val out = Engine.run(Node.fromJson(
        """{"action":"sitemap-urls","params":[{"xml":"xml"}],"children":[
          | {"action":"tap","params":["out"]}]}""".stripMargin),
      Seq(urlset).toDF("xml"), EngineCtx(testMode = true)).taps("out")
    assert(out.select("loc").collect().map(_.getString(0)).sorted.toSeq
      == Seq("http://e.com/a", "http://e.com/b"))
    val idx = "<sitemapindex><sitemap><loc>http://e.com/s.xml</loc></sitemap></sitemapindex>"
    val out2 = Engine.run(Node.fromJson(
        """{"action":"sitemap-index","params":[{"xml":"xml"}],"children":[
          | {"action":"tap","params":["out"]}]}""".stripMargin),
      Seq(idx).toDF("xml"), EngineCtx(testMode = true)).taps("out")
    assert(out2.select("loc").collect().map(_.getString(0)).toSeq
      == Seq("http://e.com/s.xml"))
  }
}
