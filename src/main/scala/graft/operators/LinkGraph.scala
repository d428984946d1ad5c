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
      // dangling mass: rank parked on nodes with no out-edges (exact
      // decimal sum -> one driver scalar)
      val dang = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank").cast("decimal(38,18)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)")))
        .head.getDecimal(0).doubleValue()
      val contrib = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          (col("rank") / col("deg").cast("double")).cast("decimal(38,18)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      ranks = Materialize(nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("c").cast("double"), lit(0.0)) + lit(dang) / lit(nD)))
            .as("rank")))
      t += 1
    }
    ranks
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

  /** Ranks joined back to a document frame by a key column — the "weight
    * documents by their host's rank" step. Documents whose key has no
    * rank (not in the graph) get null.
    */
  def rankJoin(docs: DataFrame, keyCol: String, ranks: DataFrame): DataFrame =
    docs.join(broadcast(ranks.withColumnRenamed("node", "__rk_node")),
      docs(keyCol) === col("__rk_node"), "left")
      .drop("__rk_node")
}
