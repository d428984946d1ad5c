package graft

import graft.operators.Decontam
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark-decontamination semantics: planted overlap is flagged, the
  * Bloom scale path is row-identical to the exact path, and the cleaned
  * corpus is exactly train-minus-flagged.
  */
class DecontamSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus() = {
    val s = spark
    import s.implicits._
    // bench doc 100 is a verbatim copy of train doc 1 (contaminated);
    // train doc 2 shares a 3-shingle phrase; doc 3 is clean.
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "we observe the quick brown fox jumps far away from town today"),
      (3L, "completely unrelated text about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    (train, bench)
  }

  test("planted contamination flagged at the right hit counts") {
    val (train, bench) = corpus()
    val report = Decontam.contaminationReport(train, bench, "doc_id", "text", minHits = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.contains(1L))
    assert(report(1L) == 12L) // 13 tokens -> 12 distinct bigram shingles, all shared
    assert(report.contains(2L)) // "the quick", "quick brown", "brown fox", "fox jumps"
    assert(report(2L) == 4L)
    assert(!report.contains(3L))
    // raising minHits drops the partial overlap but keeps the copy
    val strict = Decontam.contaminationReport(train, bench, "doc_id", "text", minHits = 5)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("bloom prefilter path returns identical rows to the exact path") {
    val (train, bench) = corpus()
    val exact = Decontam.contaminationReport(train, bench, "doc_id", "text", minHits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Decontam.contaminationBloom(train, bench, "doc_id", "text", minHits = 3,
      expectedItems = 1000L, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact)
  }

  test("decontaminate = train minus flagged") {
    val (train, bench) = corpus()
    val clean = Decontam.decontaminate(train, bench, "doc_id", "text", minHits = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L))
    // empty benchmark -> nothing flagged, corpus unchanged
    val none = Decontam.decontaminate(train, bench.limit(0), "doc_id", "text", minHits = 3)
    assert(none.count() == 3)
  }

  test("attribution pairs name the leaking benchmark doc with the shared count") {
    val (train, bench) = corpus()
    val pairs = Decontam.contaminationPairs(train, bench, "doc_id", "text", minHits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 100L) -> 12L, (2L, 100L) -> 4L))
    // flag path agrees with the report on hits for every doc
    val flags = Decontam.flagContaminated(train, bench, "doc_id", "text", minHits = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bench_hits"), r.getAs[Boolean]("contaminated"))).toMap
    assert(flags == Map(1L -> ((12L, true)), 2L -> ((4L, true)), 3L -> ((0L, false))))
  }

  test("overlapFraction grades every doc: verbatim copy 1.0, partial share, clean 0.0") {
    val (train, bench) = corpus()
    val out = Decontam.overlapFraction(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: all 12 distinct shingles shared (verbatim copy)
    assert(out(1L) == ((12L, 12L, 1.0)))
    // doc 2: 11 distinct shingles, 4 shared with the bench phrase
    assert(out(2L) == ((11L, 4L, 4.0 / 11.0)))
    // doc 3: clean, still reported
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    // empty doc reports (0, 0, 0.0) instead of vanishing
    val s = spark
    import s.implicits._
    val withEmpty = train.union(Seq((9L, "")).toDF("doc_id", "text"))
    val e = Decontam.overlapFraction(withEmpty, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e(9L) == 0L)
    // graded signal is consistent with the binary report's hit counts
    val hits = Decontam.contaminationReport(train, bench, "doc_id", "text", minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 12L, 2L -> 4L))
  }

  test("fuzzy decontamination catches near-dup leaks and composes with exact") {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely unrelated text about spark catalyst optimizer internals")).toDF("doc_id", "text")
    // bench: a lightly-EDITED copy of train doc 1 (one word swapped) —
    // high Jaccard, shares MinHash bands
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
      .toDF("doc_id", "text")
    val flagged = Decontam.fuzzyContamination(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(1L) && flagged(1L) == 100L, "edited near-dup must flag")
    assert(!flagged.contains(2L), "unrelated doc must not flag")
    val cleaned = Decontam.decontaminateFuzzy(train, bench, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleaned == Set(2L))

    // IR face: artifact-total validate, run against a written bench
    import graft.ir.{Engine, EngineCtx, Node}
    assert(Engine.validate(Node.fromJson(
      """{"action":"decontam-fuzzy","params":[{"id":"doc_id","text":"text","bench-path":"/does/not/exist"}],
        | "children":[]}""".stripMargin), s, schema = train.schema).isEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("fuzzy_bench").toString
    bench.write.mode("overwrite").parquet(s"$tmp/bench")
    val kept = Engine.run(Node.fromJson(
      s"""{"action":"decontam-fuzzy","params":[{"id":"doc_id","text":"text","bench-path":"$tmp/bench"}],
         | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      train, EngineCtx(testMode = true)).taps("out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }
}
