package graft

import graft.sources.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt (RFC 9309) kernel laws: group parsing, agent selection,
  * wildcard/anchor matching, longest-match precedence with Allow winning
  * ties, totality on hostile input, and the broadcast filter face. The
  * longest-match semantics are oracle-gated (`robots_allowed`).
  */
class RobotsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Body =
    """# comment line
      |User-agent: googlebot
      |User-agent: examplebot
      |Disallow: /private
      |Allow: /private/ok
      |Crawl-delay: 1.5
      |
      |User-agent: *
      |Disallow: /tmp
      |Disallow: /*.pdf$
      |Allow: /tmp/shared
      |""".stripMargin

  test("parse: groups, shared agent lines, crawl-delay, comments") {
    val gs = Robots.parse(Body)
    assert(gs.size == 2)
    assert(gs.head.agents == Seq("googlebot", "examplebot"))
    assert(gs.head.crawlDelay.contains(1.5))
    assert(gs.head.rules == Seq(
      Robots.Rule(false, "/private"), Robots.Rule(true, "/private/ok")))
    assert(gs(1).agents == Seq("*"))
    // a user-agent line AFTER rules starts a new group
    val two = Robots.parse("User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n")
    assert(two.size == 2 && two(1).agents == Seq("b"))
  }

  test("rulesFor: longest product-token match, * fallback, none -> allow all") {
    val gs = Robots.parse(Body)
    assert(Robots.rulesFor(gs, "Mozilla compatible GoogleBot/2.1").head.pattern == "/private")
    assert(Robots.rulesFor(gs, "randombot").head.pattern == "/tmp")
    assert(Robots.rulesFor(Robots.parse("Sitemap: /s.xml\n"), "any").isEmpty)
  }

  test("matches: prefix, * wildcard, $ anchor (RFC 9309 examples)") {
    assert(Robots.matches("/", "/anything"))
    assert(Robots.matches("/fish", "/fish.html") && Robots.matches("/fish", "/fishheads"))
    assert(!Robots.matches("/fish", "/Fish"))
    assert(Robots.matches("/*.php", "/index.php") && Robots.matches("/*.php", "/a/b.php?x=1"))
    assert(!Robots.matches("/*.php", "/index.html"))
    assert(Robots.matches("/*.php$", "/index.php") && !Robots.matches("/*.php$", "/index.php?x=1"))
    assert(Robots.matches("/fish*.php", "/fishheads/catfish.php"))
    assert(!Robots.matches("/fish*.php", "/catfish.php"))
    assert(Robots.matches("/x$", "/x") && !Robots.matches("/x$", "/xy"))
  }

  test("isAllowed: longest match wins, Allow wins ties, no match allows") {
    val rules = Seq(
      Robots.Rule(false, "/p"), Robots.Rule(true, "/p/ok"),
      Robots.Rule(false, "/p/okno"))
    assert(!Robots.isAllowed("/p/x", rules))
    assert(Robots.isAllowed("/p/ok/deep", rules))
    assert(!Robots.isAllowed("/p/okno", rules)) // longer disallow beats /p/ok
    assert(Robots.isAllowed("/other", rules))
    // tie: same length allow + disallow -> allow
    val tie = Seq(Robots.Rule(false, "/ab"), Robots.Rule(true, "/ab"))
    assert(Robots.isAllowed("/abc", tie))
  }

  test("totality: garbage, empty values, rules before any agent") {
    assert(Robots.parse("").isEmpty)
    assert(Robots.parse("Disallow: /x\n").isEmpty) // no group -> dropped
    assert(Robots.parse(":::\nnot a directive\nUser-agent: *\nDisallow:\n").size == 1)
    // empty Disallow = no rule = allow everything
    val g = Robots.parse("User-agent: *\nDisallow:\n")
    assert(Robots.isAllowed("/anything", Robots.rulesFor(g, "x")))
  }

  test("filterAllowed: per-host broadcast rules, unknown hosts and bad URIs allowed") {
    val s = spark
    import s.implicits._
    val robots = Map("h.example" -> "User-agent: *\nDisallow: /secret\n")
    val df = Seq(
      (1L, "http://h.example/secret/x"),
      (2L, "http://h.example/public"),
      (3L, "http://other.example/secret"),
      (4L, "not a uri at all"),
      (5L, null.asInstanceOf[String])).toDF("id", "uri")
    val out = Robots.filterAllowed(df, "uri", robots)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
  }

  test("robots-filter is a declarable IR action") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq((1L, "http://h/x"), (2L, "http://h/ok")).toDF("id", "uri")
    val out = Engine.run(Node.fromJson(
      """{"action":"robots-filter",
        | "params":[{"uri":"uri","robots":{"h":"User-agent: *\nDisallow: /x\n"}}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    val got = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> true))
  }

  test("hostBodies: 2xx /robots.txt only, freshest per host; composes to a schedule") {
    val s = spark
    import s.implicits._
    val responses = Seq(
      ("http://A.example/robots.txt", "2024-01-01T00:00:00Z", 200, "User-agent: *\nCrawl-delay: 4\n"),
      ("http://a.example/robots.txt", "2024-02-01T00:00:00Z", 200, "User-agent: *\nCrawl-delay: 2\n"),
      ("http://a.example/robots.txt", "2024-03-01T00:00:00Z", 404, "gone"),
      ("http://b.example/robots.txt", "2024-01-01T00:00:00Z", 200, "User-agent: *\nDisallow: /x\n"),
      ("http://b.example/page", "2024-01-01T00:00:00Z", 200, "not robots"),
      ("http://c.example/robots.txt.bak", "2024-01-01T00:00:00Z", 200, "wrong path")
    ).toDF("target_uri", "warc_date", "status", "text")
    val bodies = graft.sources.Robots.hostBodies(responses)
    val m = graft.sources.Robots.collectByHost(bodies)
    assert(m.keySet == Set("a.example", "b.example"))
    assert(m("a.example").contains("Crawl-delay: 2")) // freshest 2xx capture
    // harvested map drives the scheduler end to end
    val sched = graft.sources.Robots.fetchSchedule(
      Seq("http://a.example/1", "http://a.example/2").toDF("uri"), "uri", m)
      .select("fetch_offset_s").collect().map(_.getDouble(0)).sorted
    assert(sched.toSeq == Seq(0.0, 2.0))
  }

  test("robots-harvest is a declarable IR action") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val responses = Seq(
      ("http://h.example/robots.txt", "2024-01-01T00:00:00Z", 200, "User-agent: *\n"))
      .toDF("target_uri", "warc_date", "status", "text")
    val out = Engine.run(Node.fromJson(
        """{"action":"robots-harvest","children":[{"action":"tap","params":["out"]}]}"""),
      responses, EngineCtx(testMode = true)).taps("out").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq("h.example" -> "User-agent: *\n"))
  }

  test("delayFor: matched group's Crawl-delay, agent-specific beats *") {
    val groups = Robots.parse(
      """User-agent: fastbot
        |Crawl-delay: 0.1
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 5
        |""".stripMargin)
    assert(Robots.delayFor(groups, "FastBot/1.0") == Some(0.1))
    assert(Robots.delayFor(groups, "otherbot") == Some(5.0))
    assert(Robots.delayFor(Robots.parse("User-agent: *\nDisallow: /a\n"), "x").isEmpty)
  }

  test("fetchSchedule: per-host sequencing under Crawl-delay, default for the rest") {
    val s = spark
    import s.implicits._
    val robots = Map("slow.example" -> "User-agent: *\nCrawl-delay: 2\n")
    val df = Seq(
      "http://slow.example/b", "http://slow.example/a", "http://slow.example/c",
      "http://fast.example/p", "http://fast.example/q").toDF("uri")
    val out = Robots.fetchSchedule(df, "uri", robots, defaultDelay = 0.5)
      .select("uri", "host", "fetch_seq", "fetch_offset_s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("http://fast.example/p", "fast.example", 1, 0.0),
      ("http://fast.example/q", "fast.example", 2, 0.5),
      ("http://slow.example/a", "slow.example", 1, 0.0),
      ("http://slow.example/b", "slow.example", 2, 2.0),
      ("http://slow.example/c", "slow.example", 3, 4.0)))
  }

  test("fetch-schedule is a declarable IR action") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq("http://h/1", "http://h/2").toDF("uri")
    val out = Engine.run(Node.fromJson(
      """{"action":"fetch-schedule",
        | "params":[{"uri":"uri","robots":{"h":"User-agent: *\nCrawl-delay: 3\n"}}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    val got = out.select("uri", "fetch_offset_s").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(got.toSeq == Seq("http://h/1" -> 0.0, "http://h/2" -> 3.0))
  }

  test("metaRobotsDirectives: quoting shapes, attribute order, decoys, unions, agents") {
    import graft.sources.Robots
    val s = spark
    import s.implicits._
    val cases = Seq(
      (1L, """<meta name="robots" content="noindex, follow"><meta name="ROBOTS" content="NOARCHIVE">"""),
      (2L, """<meta content='nofollow' name='robots'>"""),
      (3L, """<meta name=robots content=none>"""),
      (4L, """<meta name="description" content="noindex">decoy"""),
      (5L, """no html at all"""),
      (6L, """<meta name="mybot" content="noindex">"""),
      (7L, """<meta name="robots" content="">"""),
      // an SEO page QUOTING the directive inside a content VALUE — the
      // name test is attribute-anchored, so none of these are robots tags
      (9L, """<meta name="description" content="noindex, name=robots explained">"""),
      (10L, """<meta name="description" content=name=robots>"""))
    val df = cases.toDF("id", "html")
    def dirs(agent: String) = df.select(col("id"),
        array_join(array_sort(Robots.metaRobotsDirectives(col("html"), agent)), ",").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val generic = dirs("robots")
    assert(generic == Map(1L -> "follow,noarchive,noindex", 2L -> "nofollow",
      3L -> "none", 4L -> "", 5L -> "", 6L -> "", 7L -> "", 9L -> "", 10L -> ""))
    // the named agent also sees its own product-token tags
    assert(dirs("MyBot")(6L) == "noindex")

    val kept = Robots.noindexFilter(df, "html")
      .select("id").collect().map(_.getLong(0)).sorted
    // 1 (noindex) and 3 (none) drop; every decoy survives
    assert(kept.toSeq == Seq(2L, 4L, 5L, 6L, 7L, 9L, 10L))
    assert(Robots.noindexFilter(df, "html", agent = "mybot")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 4L, 5L, 7L, 9L, 10L))

    // null html is total (no tags -> kept)
    val withNull = Seq((8L, null: String)).toDF("id", "html")
    assert(Robots.noindexFilter(withNull, "html").count() == 1L)
  }

  test("noindex-filter and meta-robots are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """<meta name="robots" content="noindex">"""),
      (2L, """fine""")).toDF("id", "html")
    val kept = Engine.run(Node.fromJson(
        """{"action":"noindex-filter","params":[{"html":"html"}],
          | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
    val dirs = Engine.run(Node.fromJson(
        """{"action":"meta-robots","params":[{"html":"html","out":"d"}],
          | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("d"))).toMap
    assert(dirs(1L) == Seq("noindex") && dirs(2L).isEmpty)
  }
}
