package graft

import graft.functions.MultiMatch
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick multi-pattern kernel: exact counts vs a naive
  * all-positions reference (overlaps, nesting, multi-byte UTF-8),
  * codegen/interpreted parity, null/empty totality, dictionary-size
  * guardrails, and the C4 bad-words operator layer on top.
  */
class MultiMatchSpec extends AnyFunSuite {
  import TestSpark.spark

  /** All-occurrences reference: every (position, pattern) pair. */
  private def refCount(text: String, patterns: Seq[String]): Long = {
    val bytes = text.getBytes("UTF-8")
    patterns.distinct.map { p =>
      val pb = p.getBytes("UTF-8")
      (0 to bytes.length - pb.length).count(i =>
        pb.indices.forall(j => bytes(i + j) == pb(j))).toLong
    }.sum
  }

  private val texts = Seq(
    "the fast key order sort table scan merge",
    "aaaa",                       // self-overlapping placements
    "slow slower slowest low",    // nested patterns
    "naïve café déjà vu — ünïcode", // multi-byte
    "ababab",
    "",
    "no hits here at all")

  private val patterns = Seq("low", "slow", "aa", "ab", "café", "scan merge", "é")

  test("AcAutomaton: counts match the naive all-positions reference") {
    texts.foreach { t =>
      val got = new MultiMatch.AcAutomaton(patterns.toArray)
        .countOccurrences(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(got == refCount(t, patterns), s"text='$t'")
    }
  }

  test("column kernels: codegen and interpreted agree with the reference; null in, null out") {
    val s = spark
    import s.implicits._
    val df = (texts.map(Option(_)) :+ None).toDF("t")
    def run(): Seq[(Option[String], Option[Long], Option[Boolean])] =
      df.select(col("t"),
          MultiMatch.countOccurrences(col("t"), patterns).as("n"),
          MultiMatch.containsAny(col("t"), patterns).as("any"))
        .collect().toSeq.map(r => (
          Option(r.getString(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
    val gen = run()
    val off = s.conf.get("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try run() finally s.conf.set("spark.sql.codegen.wholeStage", off)
    assert(gen.toSet == interp.toSet)
    gen.foreach {
      case (Some(t), n, any) =>
        assert(n.contains(refCount(t, patterns)), s"text='$t'")
        assert(any.contains(refCount(t, patterns) > 0), s"text='$t'")
      case (None, n, any) => assert(n.isEmpty && any.isEmpty)
    }
  }

  test("guardrails: empty list, empty pattern, duplicates, dictionary cap") {
    intercept[IllegalArgumentException](new MultiMatch.AcAutomaton(Array.empty))
    intercept[IllegalArgumentException](new MultiMatch.AcAutomaton(Array("a", "")))
    intercept[IllegalArgumentException](new MultiMatch.AcAutomaton(Array("a", "a")))
    intercept[IllegalArgumentException](
      new MultiMatch.AcAutomaton(Array("x" * (MultiMatch.MaxPatternBytes + 1))))
    // the Column layer dedupes instead of failing
    val s = spark
    import s.implicits._
    val n = Seq("xyx").toDF("t")
      .select(MultiMatch.countOccurrences(col("t"), Seq("x", "x")).as("n"))
      .head().getLong(0)
    assert(n == 2L)
  }

  test("badwordsFilter/Signal: the C4 rule over a small corpus, case folding, maxHits") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a perfectly CLEAN document"),
      (2L, "contains one Badword here"),
      (3L, "badword badword badword"),
      (4L, "BADWORD and also forbidden phrase"),
      (5L, "nothing to see")).toDF("doc_id", "text")
    val bad = Seq("badword", "forbidden phrase")
    assert(Curation.badwordsFilter(df, "text", bad).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    assert(Curation.badwordsFilter(df, "text", bad, maxHits = 1L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 5L))
    // case-sensitive mode no longer sees doc 2's "Badword"; doc 4 still
    // falls to its lower-case "forbidden phrase"
    assert(Curation.badwordsFilter(df, "text", bad, caseInsensitive = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 5L))
    val sig = Curation.badwordsSignal(df, "text", bad)
      .select("doc_id", "badword_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig == Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 2L, 5L -> 0L))
  }

  test("redact: span union, overlap merge, adjacency separate, case fold, back-reaching long match") {
    val s = spark
    import s.implicits._
    def run(text: String, pats: Seq[String], fold: Boolean = false): String = {
      val p = if (fold) pats.map(_.toLowerCase) else pats
      Seq(text).toDF("t")
        .select(MultiMatch.redact(col("t"), p, "[X]", asciiFold = fold).as("r"))
        .head().getString(0)
    }
    assert(run("a badword here", Seq("badword")) == "a [X] here")
    // nested patterns: the longest ending at a position covers the short
    assert(run("slow", Seq("low", "slow")) == "[X]")
    // overlapping matches merge into ONE mask
    assert(run("xabababy", Seq("abab")) == "x[X]y")
    // adjacent but disjoint matches mask separately (== chained replace)
    assert(run("abab", Seq("ab")) == "[X][X]")
    // a long match reaching back over an earlier flushed short one
    assert(run("abcdefghij", Seq("bc", "ef", "abcdefghij")) == "[X]")
    // ascii fold matches case-blind, untouched text keeps its case
    assert(run("KEEP Badword CASE", Seq("badword"), fold = true) == "KEEP [X] CASE")
    // multi-byte text around the span survives intact
    assert(run("naïve badword café", Seq("badword")) == "naïve [X] café")
    // no match returns the input unchanged; null in, null out
    assert(run("clean", Seq("badword")) == "clean")
    val nullOut = Seq(Option.empty[String]).toDF("t")
      .select(MultiMatch.redact(col("t"), Seq("x"), "[X]").as("r")).head()
    assert(nullOut.isNullAt(0))
    // interpreted path agrees
    val off = s.conf.get("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run("xabababy", Seq("abab")) == "x[X]y")
    finally s.conf.set("spark.sql.codegen.wholeStage", off)
    // operator face: redacted column appended, original case preserved
    val red = Curation.badwordsRedact(
        Seq((1L, "a BADWORD and a forbidden phrase")).toDF("doc_id", "text"),
        "text", Seq("badword", "forbidden phrase"))
      .select("text_redacted").head().getString(0)
    assert(red == "a [REDACTED] and a [REDACTED]")
  }

  test("only pattern strings ride the wire: serialized automaton is tiny, tables rebuild") {
    import org.apache.spark.unsafe.types.UTF8String
    val ac = new MultiMatch.AcAutomaton(Array("badword", "forbidden phrase"))
    assert(ac.countOccurrences(UTF8String.fromString("x badword")) == 1L) // force build
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac); oos.close()
    // dense goto table would be ~24 KB here; pattern strings are ~25 B
    assert(bos.size() < 2000, s"serialized automaton is ${bos.size()} bytes")
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[MultiMatch.AcAutomaton]
    assert(back.countOccurrences(
      UTF8String.fromString("a badword and a forbidden phrase")) == 2L)
  }

  test("badwordsFilter runs unchanged on a streaming frame (stateless map-side op)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, String)]
    val filtered = Curation.badwordsFilter(
      ms.toDF().toDF("doc_id", "text"), "text", Seq("badword"))
    assert(filtered.isStreaming)
    val q = filtered.writeStream.format("memory").queryName("bw_stream_out")
      .outputMode("append").start()
    try {
      ms.addData((1L, "clean"), (2L, "a BADWORD here"), (3L, "also clean"))
      q.processAllAvailable()
      val got = s.sql("SELECT doc_id FROM bw_stream_out").collect()
        .map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("badwords-filter and badwords-signal are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq((1L, "clean"), (2L, "a BADWORD"), (3L, "badword badword"))
      .toDF("doc_id", "text")
    val kept = Engine.run(Node.fromJson(
        """{"action":"badwords-filter","params":[{"text":"text","patterns":["badword"]}],
          | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L))
    val hits = Engine.run(Node.fromJson(
        """{"action":"badwords-signal","params":[{"text":"text","patterns":["badword"],"out":"h"}],
          | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("h")).toMap
    assert(hits == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
