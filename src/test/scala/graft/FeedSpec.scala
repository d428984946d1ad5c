package graft

import graft.sources.Feed
import org.scalatest.funsuite.AnyFunSuite

/** RSS 2.0 / Atom parsing: item/entry explode, the alternate-link
  * resolution rule, format sniffing, totality on malformed XML. The XML
  * round trip is oracle-gated (`feed_urls`).
  */
class FeedSpec extends AnyFunSuite {
  import TestSpark.spark

  private val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0"><channel>
      |  <title>chan</title>
      |  <item><link>http://e.com/a</link><title>A</title>
      |    <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><guid>ga</guid></item>
      |  <item><link>http://e.com/b</link><title>B</title></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<?xml version="1.0"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |  <entry>
      |    <link rel="self" href="http://e.com/feed"/>
      |    <link rel="alternate" href="http://e.com/x"/>
      |    <title>X</title><updated>2024-01-01T00:00:00Z</updated><id>gx</id>
      |  </entry>
      |  <entry>
      |    <link href="http://e.com/y"/>
      |    <title>Y</title><updated>2024-01-02T00:00:00Z</updated><id>gy</id>
      |  </entry>
      |</feed>""".stripMargin

  test("parseRss: one row per item, absent children null") {
    val s = spark
    import s.implicits._
    val out = Feed.parseRss(Seq(("f1", rss)).toDF("id", "xml"))
      .select("url", "title", "published", "entry_id").orderBy("url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "http://e.com/a" && out(0).getString(3) == "ga")
    assert(out(1).getString(0) == "http://e.com/b" && out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("parseAtom: alternate link beats self; bare link is the implied alternate") {
    val s = spark
    import s.implicits._
    val out = Feed.parseAtom(Seq(("f2", atom)).toDF("id", "xml"))
      .select("url", "title", "entry_id").orderBy("entry_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "http://e.com/x", s"self link must lose: ${out(0)}")
    assert(out(1).getString(0) == "http://e.com/y")
  }

  test("discoveryLinks: any attribute order/quoting; decoys and garbage excluded") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val pages = Seq(
      ("a", """<head><link rel="alternate" type="application/rss+xml" href="http://e/rss">
              |<link rel="stylesheet" href="/css"></head>""".stripMargin.replace("\n", "")),
      ("b", "<head><LINK href='http://e/atom' TYPE='application/atom+xml' REL=alternate></head>"),
      ("c", """<head><link rel="alternate" type="text/html" href="http://e/mobile"></head>"""),
      ("d", "no html at all"),
      ("e", """<link type="application/rss+xml" href="http://e/r2" rel="alternate">""")
    ).toDF("id", "html")
    val out = pages.select(col("id"), graft.sources.Feed.discoveryLinks(col("html")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("a") == Seq("http://e/rss"))
    assert(out("b") == Seq("http://e/atom"))
    assert(out("c").isEmpty, "text/html alternate is not a feed")
    assert(out("d").isEmpty)
    assert(out("e") == Seq("http://e/r2"), "attribute order must not matter")
  }

  test("discoveryLinks: unquoted href and type values (legal HTML) extract like quoted ones") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val pages = Seq(
      ("u1", "<head><link rel=alternate type=application/rss+xml href=http://e/u1></head>"),
      ("u2", "<head><link href=/feed.xml rel=alternate type=application/atom+xml></head>"),
      // quoted href containing a space still extracts in full
      ("q1", """<link rel=alternate type=application/rss+xml href="http://e/my feed.xml">"""),
      // unquoted href ends at whitespace — the trailing attr is not swallowed
      ("u3", "<link rel=alternate href=http://e/u3 type=application/rss+xml>")
    ).toDF("id", "html")
    val out = pages.select(col("id"), Feed.discoveryLinks(col("html")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("u1") == Seq("http://e/u1"))
    assert(out("u2") == Seq("/feed.xml"))
    assert(out("q1") == Seq("http://e/my feed.xml"))
    assert(out("u3") == Seq("http://e/u3"))
  }

  test("eventTime: RFC-822 and RFC-3339 forms parse to ns; garbage and impossible dates are null, never throw") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("rfc822_gmt", "Mon, 01 Jan 2024 00:00:00 GMT", Some(1704067200000000000L)),
      ("rfc822_offset", "1 Jan 2024 02:30:00 +0230", Some(1704067200000000000L)),
      ("rfc822_wrong_weekday", "Tue, 01 Jan 2024 00:00:00 GMT", Some(1704067200000000000L)),
      ("rfc822_no_secs", "01 Jan 2024 00:00 GMT", Some(1704067200000000000L)),
      ("rfc822_ut_zone", "Mon, 01 Jan 2024 00:00:00 UT", Some(1704067200000000000L)),
      ("rfc3339_z", "2024-01-01T00:00:00Z", Some(1704067200000000000L)),
      ("rfc3339_frac_offset", "2024-01-01T00:00:00.250+00:00", Some(1704067200250000000L)),
      ("rfc3339_neg_offset", "2023-12-31T19:00:00-05:00", Some(1704067200000000000L)),
      ("garbage", "not a date", None),
      ("empty", "", None),
      ("impossible", "Wed, 31 Feb 2024 10:00:00 GMT", None),
      ("null_in", null, None))
    val df = rows.map { case (k, v, _) => (k, v) }.toDF("k", "published")
    val got = Feed.withEventTime(df)
      .select(col("k"), col("time"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    rows.foreach { case (k, _, want) =>
      assert(got(k) == want, s"$k: got ${got(k)}, want $want")
    }
  }

  test("IR feed-urls == direct parseFeeds on the same bodies") {
    val s = spark
    import s.implicits._
    import graft.ir.{Engine, EngineCtx, Node}
    val df = Seq(("a", rss), ("b", atom)).toDF("id", "xml")
    val direct = Feed.parseFeeds(df).select("feed_type", "url", "entry_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val ir = Engine.run(Node.fromJson(
      """{"action":"feed-urls","params":[{"xml":"xml"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .select("feed_type", "url", "entry_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ir == direct && direct.size == 4)
    // parse-times appends the ns event time: the RSS item's RFC-822
    // pubDate parses, the Atom fixture's p-prefixed strings are garbage
    val timed = Engine.run(Node.fromJson(
      """{"action":"feed-urls","params":[{"xml":"xml","parse-times":true}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .select("entry_id", "time")
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(timed(Some("ga")) == Some(1704067200000000000L), s"$timed")
    assert(timed(Some("gx")).contains(1704067200000000000L))
    assert(timed(None).isEmpty, "item without pubDate has null time")
  }

  test("parseFeeds: format sniffing routes each body once; garbage contributes nothing") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", rss), ("b", atom), ("c", "not xml at all"),
      ("d", "<html><body>page</body></html>")).toDF("id", "xml")
    val out = Feed.parseFeeds(df).select("feed_type", "url").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("rss", "http://e.com/a"), ("rss", "http://e.com/b"),
      ("atom", "http://e.com/x"), ("atom", "http://e.com/y")))
  }
}
