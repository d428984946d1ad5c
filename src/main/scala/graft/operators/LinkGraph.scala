package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph importance scoring — PageRank (Brin & Page 1998) as the
  * classic iterative distributed computation a web-corpus curation
  * pipeline uses for host/domain quality signals (the Common-Crawl-era
  * practice: rank hosts by the link graph, weight or filter documents by
  * their host's rank).
  *
  * Scale shape per power iteration: ONE shuffle (the contribution
  * `groupBy(dst)` with map-side combine); the edges⋈ranks join shuffles
  * on `src` once per iteration (ranks are node-sized, edges fact-sized —
  * at web scale both are partitioned on the join key; AQE broadcasts the
  * rank side when it is small). Ranks are [[Materialize]]d per round so
  * lineage does not grow with iterations ([[Dedup]] label-prop /
  * [[Tokenizer]] BPE convention); the dangling-mass term is a one-row
  * driver scalar per round, like the GD loop's weight collect.
  *
  * Determinism (what makes a fixed-iteration run ORACLE-replayable,
  * unusual for distributed PageRank): each edge's contribution
  * `rank / outdeg` is rounded to `DECIMAL(38,18)` BEFORE the sum, so
  * the per-node sum is exact integer-scaled arithmetic — independent of
  * partitioning and addition order — and every downstream op
  * (`(1-d)/N + d * (contrib + dangling/N)`) is the same IEEE expression
  * on both engines. The price is one rounding at 1e-18 per edge,
  * ~1e-15 relative — far below the power iteration's own convergence
  * tolerance.
  *
  * Dangling nodes (no out-edges) redistribute their mass uniformly (the
  * standard fix); total rank mass stays 1 every iteration
  * (spec-pinned).
  */
object LinkGraph {

  /** `iters` power iterations over an edge list. Self-loops count;
    * parallel edges count once each (pre-`distinct` upstream if not
    * wanted). Output: (node, rank), all nodes (sources and sinks).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1,
      s"pageRank: damping must be in (0, 1), got $damping")
    val e = Materialize(edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull))
    val nodes = Materialize(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val nD = n.toDouble
    val outdeg = Materialize(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val base = (1.0 - damping) / nD
    var ranks = Materialize(nodes.select(col("node"), lit(1.0 / nD).as("rank")))
    var t = 0
    while (t < iters) {
      // dangling mass: rank parked on nodes with no out-edges — an exact
      // decimal one-ROW aggregate, cross-joined into the round's plan
      // instead of collected to the driver (r16: was a separate `head`
      // job per iteration; `cast(decimal→double)` is BigDecimal
      // .doubleValue, bit-identical to the collected scalar, so the
      // oracle-replayed arithmetic is unchanged)
      val dang = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank").cast("decimal(38,18)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)")).as("__dang"))
      val contrib = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          (col("rank") / col("deg").cast("double")).cast("decimal(38,18)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      ranks = Materialize(nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("c").cast("double"), lit(0.0)) +
              col("__dang").cast("double") / lit(nD)))
            .as("rank")))
      t += 1
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) — the complement of
    * [[pageRank]] for crawl curation: PageRank scores global endorsement,
    * HITS separates DIRECTORY pages (hubs: link to many good sources —
    * link farms and index spam also score here, which is why it's a
    * useful spam feature) from CONTENT pages (authorities). Fixed
    * `iters` mutual-reinforcement rounds:
    * `auth ∝ Σ_in hub`, then `hub ∝ Σ_out auth`, each half-step
    * L1-normalized (Kleinberg uses L2; L1 keeps every op a plain
    * sum/divide so the oracle replays it exactly — the RANKING is
    * identical, scores are a constant multiple per round).
    *
    * Scale/determinism shape = [[pageRank]]: one map-side-combined
    * `groupBy` shuffle per half-step, per-edge contributions rounded to
    * `DECIMAL(38,18)` before the sum (order-independent), the L1 total
    * is a one-row exact-decimal driver scalar, scores
    * [[Materialize]]d per round so lineage stays flat.
    *
    * Output: `(node, auth, hub)` over all nodes; sink-only nodes have
    * hub 0, source-only nodes auth 0.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 5): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val e = Materialize(edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull))
    val nodes = Materialize(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    require(e.limit(1).count() > 0, "hits: empty edge list")
    var scores = Materialize(nodes.select(col("node"),
      lit(1.0).as("auth"), lit(1.0).as("hub")))
    var t = 0
    while (t < iters) {
      // authority half-step: in-link hub mass. The L1 total rides as a
      // one-row cross join instead of a per-half-step driver collect
      // (r16; cast(decimal→double) == the collected scalar bit-for-bit)
      val ca = e.join(scores, e("src") === scores("node"))
        .select(col("dst"), col("hub").cast("decimal(38,18)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val aTot = ca.agg(sum(col("s")).as("__tot"))
      val withAuth = Materialize(nodes
        .join(ca, nodes("node") === ca("dst"), "left")
        .join(scores.select(col("node").as("__n"), col("hub")),
          nodes("node") === col("__n"))
        .crossJoin(aTot)
        .select(col("node"),
          (coalesce(col("s").cast("double"), lit(0.0)) /
            col("__tot").cast("double")).as("auth"),
          col("hub")))
      // hub half-step: out-link authority mass
      val ch = e.join(withAuth, e("dst") === withAuth("node"))
        .select(col("src"), col("auth").cast("decimal(38,18)").as("c"))
        .groupBy("src").agg(sum(col("c")).as("s"))
      val hTot = ch.agg(sum(col("s")).as("__tot"))
      scores = Materialize(nodes
        .join(ch, nodes("node") === ch("src"), "left")
        .join(withAuth.select(col("node").as("__n"), col("auth")),
          nodes("node") === col("__n"))
        .crossJoin(hTot)
        .select(col("node"), col("auth"),
          (coalesce(col("s").cast("double"), lit(0.0)) /
            col("__tot").cast("double")).as("hub")))
      t += 1
    }
    scores
  }

  /** Host-level link edges mined from document text: every URL host
    * mentioned in `textCol` ([[graft.functions.Pii.urlHosts]], the
    * engine-portable extraction the URL-analysis gates already pin)
    * becomes an edge from the document's own host (`srcHostCol` — the
    * WARC `target_uri` host in a crawl pipeline). Output:
    * (src, dst, n_links) with per-pair multiplicity; self-links kept
    * (PageRank handles them; filter upstream if unwanted). Map-side
    * extraction + one map-side-combined count — the edge mining adds no
    * corpus shuffle beyond the pair aggregate.
    */
  def hostEdges(docs: DataFrame, srcHostCol: String, textCol: String): DataFrame =
    docs.select(col(srcHostCol).cast("string").as("src"),
        explode(graft.functions.Pii.urlHosts(col(textCol))).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n_links"))

  /** [[hostEdges]]'s HTML twin: edges mined from ANCHOR TAGS
    * ([[graft.functions.Pii.hrefTargets]]) — the real hyperlink graph,
    * where the text miner only sees URLs typed into prose. Only
    * absolute `http(s)` targets yield edges (a relative href stays on
    * `src`'s own host: pure self-signal, dropped with the host
    * extraction's empty result). Same shape: map-side extraction, one
    * pair-count aggregate.
    */
  def anchorEdges(docs: DataFrame, srcHostCol: String, htmlCol: String): DataFrame =
    docs.select(col(srcHostCol).cast("string").as("src"),
        explode(graft.functions.Pii.hrefTargets(col(htmlCol))).as("__u"))
      .withColumn("dst",
        regexp_extract(col("__u"), graft.functions.Pii.UrlHostPattern, 1))
      .filter(col("src").isNotNull && col("dst") =!= "")
      .groupBy("src", "dst").agg(count(lit(1)).as("n_links"))

  /** Ranks joined back to a document frame by a key column — the "weight
    * documents by their host's rank" step. Documents whose key has no
    * rank (not in the graph) get null.
    */
  def rankJoin(docs: DataFrame, keyCol: String, ranks: DataFrame): DataFrame =
    docs.join(broadcast(ranks.withColumnRenamed("node", "__rk_node")),
      docs(keyCol) === col("__rk_node"), "left")
      .drop("__rk_node")
}
