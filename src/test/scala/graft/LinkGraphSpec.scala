package graft

import graft.operators.LinkGraph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank laws on analytically-known graphs: mass conservation,
  * symmetry, dangling redistribution, convergence toward the closed
  * form, partitioning invariance (the decimal-exact contribution sums),
  * and the IR action. A fixed-iteration run over the events bipartite
  * graph is oracle-gated (`host_pagerank`).
  */
class LinkGraphSpec extends AnyFunSuite {
  import TestSpark.spark

  private def edges(rows: (String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame, iters: Int = 20) =
    LinkGraph.pageRank(df, "src", "dst", iters = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("3-cycle: symmetric graph -> uniform ranks; mass conserved") {
    val r = ranks(edges(("a", "b"), ("b", "c"), ("c", "a")))
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, r.toString))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("star: the hub out-ranks the leaves; ordering stable") {
    // leaves all point to the hub; hub dangles -> mass recycles uniformly
    val r = ranks(edges(("l1", "hub"), ("l2", "hub"), ("l3", "hub")))
    assert(r("hub") > r("l1") && r("l1") == r("l2") && r("l2") == r("l3"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("two-node reference recurrence: A -> B with B dangling") {
    // A's only inflow is base + dangling share; B gets A's full rank
    // plus both terms — the distributed run must match the scalar
    // recurrence iterated locally
    val d = 0.85
    val r = ranks(edges(("A", "B")), iters = 60)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    var (ra, rb) = (0.5, 0.5)
    for (_ <- 1 to 60) {
      val dang = rb
      val na = (1 - d) / 2 + d * (0.0 + dang / 2)
      val nb = (1 - d) / 2 + d * (ra + dang / 2)
      ra = na; rb = nb
    }
    assert(math.abs(r("A") - ra) < 1e-9 && math.abs(r("B") - rb) < 1e-9,
      s"got $r want ($ra, $rb)")
    assert(r("B") > r("A"))
  }

  test("deterministic under partitioning (decimal-exact contribution sums)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val big = (1 to 2000).map(_ =>
      (s"n${rng.nextInt(80)}", s"n${rng.nextInt(80)}")).distinct.toDF("src", "dst")
    val a = LinkGraph.pageRank(big, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = LinkGraph.pageRank(big.repartition(13), "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b) // bit-identical, not approximately equal
    assert(math.abs(a.values.sum - 1.0) < 1e-9)
  }

  test("rankJoin: documents pick up their key's rank; unknown keys null") {
    val s = spark
    import s.implicits._
    val r = LinkGraph.pageRank(edges(("a", "b")), "src", "dst", iters = 3)
    val docs = Seq((1L, "a"), (2L, "zzz")).toDF("doc_id", "host")
    val out = LinkGraph.rankJoin(docs, "host", r).orderBy("doc_id").collect()
    assert(!out(0).isNullAt(out(0).fieldIndex("rank")))
    assert(out(1).isNullAt(out(1).fieldIndex("rank")))
  }

  test("hostEdges mines text links; crawl composition: uri host -> mentioned hosts -> ranks") {
    val s = spark
    import s.implicits._
    // three docs on two hosts; everyone links to hub.example
    val docs = Seq(
      ("a.example", "read this https://hub.example/page and http://b.example/x"),
      ("b.example", "see https://hub.example/other"),
      ("hub.example", "no links here at all")).toDF("host", "text")
    val edges = graft.operators.LinkGraph.hostEdges(docs, "host", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("a.example", "hub.example", 1L), ("a.example", "b.example", 1L),
      ("b.example", "hub.example", 1L)))
    val ranks = graft.operators.LinkGraph.pageRank(
        graft.operators.LinkGraph.hostEdges(docs, "host", "text"), "src", "dst",
        iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the most-linked host out-ranks everyone
    assert(ranks("hub.example") > ranks("a.example")
      && ranks("hub.example") > ranks("b.example"), ranks.toString)
  }

  test("pagerank is a declarable IR action with a job-free validate arm") {
    import graft.ir.{Engine, EngineCtx, Node}
    val df = edges(("a", "b"), ("b", "a"))
    val out = Engine.run(Node.fromJson(
      """{"action":"pagerank","params":[{"src":"src","dst":"dst","iters":4}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    assert(out.columns.toSeq == Seq("node", "rank") && out.count() == 2L)
    val v = Engine.validate(Node.fromJson(
      """{"action":"pagerank","params":[{"src":"src","dst":"dst"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      spark, schema = df.schema)
    assert(v.isEmpty, v.mkString("; "))
  }

  private def hitsMap(df: org.apache.spark.sql.DataFrame, iters: Int = 5) =
    LinkGraph.hits(df, "src", "dst", iters = iters)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("HITS star: all authority concentrates on the pointed-to node, hubs split evenly") {
    val h = hitsMap(edges(("h1", "c"), ("h2", "c")))
    assert(h("c")._1 == 1.0, s"sole sink holds all authority: $h")
    assert(h("c")._2 == 0.0, "sink has no out-links -> hub 0")
    assert(h("h1")._1 == 0.0 && h("h2")._1 == 0.0, "pure hubs have no in-links")
    assert(math.abs(h("h1")._2 - 0.5) < 1e-12 && h("h1")._2 == h("h2")._2)
  }

  test("HITS mutual reinforcement: the hub covering both authorities beats the single-link hub") {
    // g links to both a1,a2; s links only to a1; a1 gains over a2 because
    // TWO hubs endorse it, and g's hub score beats s's because it covers more
    val h = hitsMap(edges(("g", "a1"), ("g", "a2"), ("s", "a1")), iters = 8)
    assert(h("g")._2 > h("s")._2, s"covering hub must win: $h")
    assert(h("a1")._1 > h("a2")._1, s"doubly-endorsed authority must win: $h")
  }

  test("HITS L1 invariants and independent-reference equality on a mixed graph") {
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("b", "d"))
    val iters = 4
    val got = hitsMap(edges(es: _*), iters = iters)
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, "auth L1 mass")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9, "hub L1 mass")
    // independent local reference: plain double arithmetic (the decimal
    // per-edge rounding is 1e-18 — far below this tolerance)
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var auth = nodes.map(_ -> 1.0).toMap
    var hub = nodes.map(_ -> 1.0).toMap
    for (_ <- 0 until iters) {
      val a2 = nodes.map(n => n -> es.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val at = a2.values.sum
      auth = a2.view.mapValues(_ / at).toMap
      val h2 = nodes.map(n => n -> es.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val ht = h2.values.sum
      hub = h2.view.mapValues(_ / ht).toMap
    }
    nodes.foreach { n =>
      assert(math.abs(got(n)._1 - auth(n)) < 1e-12, s"auth($n): ${got(n)._1} vs ${auth(n)}")
      assert(math.abs(got(n)._2 - hub(n)) < 1e-12, s"hub($n): ${got(n)._2} vs ${hub(n)}")
    }
  }

  test("anchorEdges: both quote styles, case-insensitive tag, relative/malformed ignored, IR") {
    val s = TestSpark.spark
    import s.implicits._
    val html =
      """<p><A HREF="http://x.com/a">one</a>
        |<a class='k' href='https://y.org/b'>two</a>
        |<a href="/relative">three</a>
        |<a href="http://x.com/c">repeat</a>
        |<a name="no-href">four</a> <a href=>broken</a></p>""".stripMargin
    val docs = Seq(("h1", html), ("h2", "no links at all"), ("h3", null.asInstanceOf[String]))
      .toDF("host", "html")
    val edges = graft.operators.LinkGraph.anchorEdges(docs, "host", "html")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(edges == Map(("h1", "x.com") -> 2L, ("h1", "y.org") -> 1L))

    import graft.ir.{Engine, EngineCtx, Node}
    val ir = Engine.run(Node.fromJson(
      """{"action":"anchor-edges","params":[{"host":"host","html":"html"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      docs, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ir == edges)
  }
}
