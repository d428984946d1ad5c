package graft.sources

import org.apache.spark.sql.DataFrame

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the crawl-
  * politeness filter next to [[Warc]]: corpora built from crawls are
  * expected to respect (or at least record) per-host exclusion rules,
  * and a re-crawl pipeline needs the matcher to schedule fetches.
  *
  * Parser: line-oriented, tolerant (unknown directives and comments
  * skipped, BOM stripped) — groups of `User-agent` lines followed by
  * `Allow`/`Disallow` rules, with `Crawl-delay` kept as an extension.
  * Matcher: RFC 9309 semantics — most-specific (longest-pattern) rule
  * wins, `Allow` wins ties, `*` matches any octet sequence, `$` anchors
  * the end, empty patterns ignored, no matching rule = allowed.
  * Group selection: longest matching product token, falling back to
  * `*`.
  *
  * Scale shape: rules are per-host and model-sized — the operator face
  * ([[filterAllowed]]) ships parsed rule tables as a broadcast map and
  * evaluates map-side; nothing shuffles.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule],
                         crawlDelay: Option[Double])

  /** Parse one robots.txt body into agent groups. */
  def parse(text: String): Seq[Group] = {
    val out = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var delay: Option[Double] = None
    var agentCount = 0
    var ruleCount = 0
    def flush(): Unit = {
      if (agentCount > 0) out += Group(agents.result(), rules.result(), delay)
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder[Rule]
      delay = None; agentCount = 0; ruleCount = 0
    }
    for (raw <- text.stripPrefix("\uFEFF").linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            // a user-agent line after rules starts a NEW group (RFC:
            // consecutive agent lines share one group)
            if (ruleCount > 0) flush()
            agents += value.toLowerCase; agentCount += 1
          case "allow" if agentCount > 0 =>
            if (value.nonEmpty) { rules += Rule(allow = true, value); ruleCount += 1 }
            else ruleCount += 1 // empty pattern: recorded, matches nothing
          case "disallow" if agentCount > 0 =>
            if (value.nonEmpty) { rules += Rule(allow = false, value); ruleCount += 1 }
            else ruleCount += 1 // empty Disallow = allow all (no rule)
          case "crawl-delay" if agentCount > 0 =>
            delay = value.toDoubleOption.orElse(delay); ruleCount += 1
          case _ => () // sitemap/unknown: skipped
        }
      }
    }
    flush()
    out.result()
  }

  /** The rule set for a product token: the group whose agent token is
    * the LONGEST substring match of `agent` (case-insensitive), falling
    * back to the `*` group, else no rules (allow all).
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] =
    groupFor(groups, agent).map(_.rules).getOrElse(Nil)

  /** The group matched for a product token — longest substring-matching
    * agent token wins, `*` group is the fallback. */
  def groupFor(groups: Seq[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val named = groups.flatMap(g => g.agents.filter(t => t != "*" && a.contains(t))
      .map(t => (t.length, g))).sortBy(-_._1)
    named.headOption.map(_._2).orElse(groups.find(_.agents.contains("*")))
  }

  /** The matched group's `Crawl-delay` (seconds), if declared. */
  def delayFor(groups: Seq[Group], agent: String): Option[Double] =
    groupFor(groups, agent).flatMap(_.crawlDelay)

  /** RFC 9309 pattern match: `*` = any octet sequence, trailing `$`
    * anchors the end; otherwise a prefix match.
    */
  def matches(pattern: String, path: String): Boolean = {
    val (p, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val parts = p.split("\\*", -1)
    // greedy left-to-right segment scan: first segment must be a prefix,
    // later segments found in order; anchored: last segment must end it
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val seg = parts(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == parts.length - 1 && anchored) {
        return path.regionMatches(path.length - seg.length, seg, 0, seg.length) &&
          path.length - seg.length >= pos
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Is `path` fetchable under `rules`? Most-specific (longest-pattern)
    * match wins; `Allow` wins length ties; no match = allowed.
    */
  def isAllowed(path: String, rules: Seq[Rule]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** Filter a frame of URIs by per-host robots bodies (host →
    * robots.txt text, model-sized — parsed once per task, shipped as a
    * broadcast-sized map; hosts absent from the map allow everything).
    * Appends `robots_allowed`; map-side, no shuffle.
    */
  def filterAllowed(docs: DataFrame, uriCol: String,
                    robotsByHost: Map[String, String],
                    agent: String = "*"): DataFrame = {
    val schema = docs.schema.add("robots_allowed",
      org.apache.spark.sql.types.BooleanType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = docs.schema.fieldIndex(uriCol)
    docs.mapPartitions { rows =>
      val rulesByHost = robotsByHost.map { case (h, txt) =>
        h -> rulesFor(parse(txt), agent)
      }
      rows.map { r =>
        val uri = if (r.isNullAt(idx)) null else r.getString(idx)
        val allowed =
          if (uri == null) true
          else {
            val u = try new java.net.URI(uri) catch { case _: Exception => null }
            if (u == null || u.getHost == null) true
            else rulesByHost.get(u.getHost.toLowerCase) match {
              case None => true
              case Some(rules) =>
                val path = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
                isAllowed(path, rules)
            }
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ allowed)
      }
    }(enc)
  }

  /** Harvest per-host robots.txt bodies from a crawl's decoded
    * responses (the [[Warc.responses]] shape): keeps `/robots.txt`
    * captures with 2xx status, extracts the host, and picks the
    * freshest capture per host ((warc_date, body) tie-break — same
    * determinism rule as [[graft.operators.Snapshots.latest]]).
    * Returns `(host, body)` — one shuffle on host, output is
    * hosts-sized.
    */
  def hostBodies(responses: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.Snapshots.latest(
      responses
        .filter(col("status").between(200, 299) &&
          lower(col("target_uri")).rlike("^https?://[^/?#]+/robots\\.txt$"))
        .select(
          lower(regexp_extract(col("target_uri"), "^[a-zA-Z]+://([^/:?#]+)", 1))
            .as("host"),
          col("warc_date"), col("text").as("body")),
      "host", "warc_date", digestCol = "body")
      .select("host", "body")
  }

  /** Driver-side map for [[filterAllowed]] / [[fetchSchedule]] — the
    * robots table is hosts-sized (model-sized by construction), which
    * is why those faces broadcast it. */
  def collectByHost(bodies: DataFrame): Map[String, String] =
    bodies.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Politeness schedule: sequence each host's fetches under its
    * robots `Crawl-delay` — appends `host`, `fetch_seq` (1-based
    * position within the host, ordered by URI for determinism) and
    * `fetch_offset_s` = `(fetch_seq - 1) × delay`, the earliest polite
    * fetch time relative to the host's crawl start. Hosts without a
    * declared delay get `defaultDelay`.
    *
    * Scale shape: the host extraction is Column regex (codegen'd,
    * map-side); delays are a model-sized broadcast join; the per-host
    * `row_number` window shuffles on host — which IS the crawl-frontier
    * partitioning (politeness is inherently per-host sequential), so
    * the exchange is the one a fetcher fleet needs anyway. Skew is
    * pages-per-host; a scheduler shards giant hosts by handing each
    * executor a contiguous `fetch_seq` range.
    */
  def fetchSchedule(docs: DataFrame, uriCol: String,
                    robotsByHost: Map[String, String],
                    agent: String = "*",
                    defaultDelay: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val delays = robotsByHost.toSeq.map { case (h, txt) =>
      (h.toLowerCase, delayFor(parse(txt), agent).getOrElse(defaultDelay))
    }.toDF("host", "__delay")
    val hosted = docs.withColumn("host",
      lower(regexp_extract(col(uriCol), "^[a-zA-Z]+://([^/:?#]+)", 1)))
    val w = Window.partitionBy(col("host")).orderBy(col(uriCol))
    hosted
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("fetch_seq", row_number().over(w))
      .withColumn("fetch_offset_s",
        (col("fetch_seq") - 1).cast("double") *
          coalesce(col("__delay"), lit(defaultDelay)))
      .drop("__delay")
  }

  /** Page-level robots META directives — the in-document half of the
    * exclusion protocol next to the host-level robots.txt rules: a
    * `<meta name="robots" content="noindex, nofollow">` tag asks
    * indexers to skip the page, and corpora built from crawls are
    * expected to honor it the way an indexer would.
    *
    * Returns the distinct lowercased directive tokens from every
    * matching meta tag (attribute order free, single/double/bare
    * quoting, comma-separated values, multiple tags unioned). `agent`
    * additionally matches that product token's tags next to the
    * generic `robots` name. Pure Column regex algebra — map-side,
    * codegen'd, no shuffle, total on arbitrary non-HTML text (no tags
    * → empty array).
    */
  def metaRobotsDirectives(html: org.apache.spark.sql.Column,
                           agent: String = "robots"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val nameAlt =
      if (agent.equalsIgnoreCase("robots")) "robots"
      else s"(?:robots|${java.util.regex.Pattern.quote(agent.toLowerCase)})"
    // total on null html: no page, no tags, no directives
    val tags = regexp_extract_all(coalesce(html, lit("")),
      lit("(?i)<meta\\b[^>]*>"), lit(0))
    // anchor the name test to ATTRIBUTE position: blank out the (quoted)
    // content value first, so content="noindex, name=robots explained"
    // (an SEO page QUOTING the directive) can never satisfy the name
    // match — only a real name attribute survives the strip
    val mine = filter(tags, t => {
      val cleaned = regexp_replace(t,
        "(?i)\\bcontent\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", "content=\"\"")
      cleaned.rlike(s"(?i)\\bname\\s*=\\s*[\"']?$nameAlt\\b")
    })
    val contents = transform(mine, t => {
      val dq = regexp_extract(t, "(?i)\\bcontent\\s*=\\s*\"([^\"]*)\"", 1)
      val sq = regexp_extract(t, "(?i)\\bcontent\\s*=\\s*'([^']*)'", 1)
      val bare = regexp_extract(t, "(?i)\\bcontent\\s*=\\s*([^\\s>\"']+)", 1)
      when(length(dq) > 0, dq).when(length(sq) > 0, sq).otherwise(bare)
    })
    val dirs = flatten(transform(contents, c => split(c, ",")))
    array_distinct(filter(transform(dirs, d => lower(trim(d))), d => length(d) > 0))
  }

  /** Does the page ask not to be indexed? `noindex` or the `none`
    * shorthand (≡ noindex,nofollow), from any matching robots meta tag.
    */
  def isNoindex(html: org.apache.spark.sql.Column,
                agent: String = "robots"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val d = metaRobotsDirectives(html, agent)
    array_contains(d, "noindex") || array_contains(d, "none")
  }

  /** Drop pages that declare `noindex`/`none` — the indexer-side rule a
    * crawl-derived corpus inherits. Map-side filter, zero shuffle.
    */
  def noindexFilter(df: DataFrame, htmlCol: String,
                    agent: String = "robots"): DataFrame = {
    import org.apache.spark.sql.functions._
    df.filter(!isNoindex(col(htmlCol), agent))
  }
}
