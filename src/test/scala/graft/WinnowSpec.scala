package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003)
  * pinned three ways: exact equality with an independent local reference
  * implementation, the paper's detection guarantee (a shared substring of
  * length >= w+k-1 always yields a shared fingerprint), and the density
  * bound. Candidate generation is checked for the guarantee end-to-end
  * plus the boilerplate maxDf cap.
  */
class WinnowSpec extends AnyFunSuite {
  import TestSpark.spark

  private val K = 5
  private val W = 4

  /** Independent reference: same normalization, md5-prefix hash, window
    * min with rightmost tie-break — written against the PAPER, not the
    * operator.
    */
  private def refWinnow(text: String): Set[(Long, Long)] = {
    val t = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val grams = (0 to t.length - K).map(i => ((i + 1).toLong, h(t.substring(i, i + K))))
    (0 to grams.length - W).map { j =>
      grams.slice(j, j + W).reduce { (a, x) =>
        if (x._2 < a._2 || (x._2 == a._2 && x._1 > a._1)) x else a
      }
    }.toSet
  }

  test("winnowFingerprints == the independent reference, including empty/short docs") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and keeps running"),
      (2L, "ab"),          // shorter than k: no fingerprints
      (3L, ""),            // empty
      (4L, "aaaaaaaaaaaaaaaaaaaa"), // degenerate: all grams identical -> tie-breaks exercised
      (5L, "Numbers 123 and punctuation!!! collapse away 456 here"))
    val got = Dedup.winnowFingerprints(rows.toDF("doc_id", "text"), "text", "doc_id", K, W)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toList
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (id, text) =>
      val want = refWinnow(text)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id: got ${got.getOrElse(id, Set.empty).take(5)} want ${want.take(5)}")
    }
    assert(!got.contains(2L) && !got.contains(3L), "short/empty docs emit nothing")
  }

  test("detection guarantee: shared passage of length >= w+k-1 always yields a shared fingerprint") {
    val s = spark
    import s.implicits._
    // the guarantee needs w+k-1 = 8 shared NORMALIZED chars; give it a
    // full shared sentence inside otherwise-disjoint text
    val passage = "unique shared plagiarized passage with enough characters"
    val docs = Seq(
      (1L, s"zzz qqq completely different opening text $passage vvv kkk trailing"),
      (2L, s"mmm nnn other unrelated content here $passage xxx yyy end"),
      (3L, "totally disjoint document with none of the passage words at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "text", "doc_id", K, W,
        minShared = 1, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"plagiarized pair must be found, got $pairs")
  }

  test("density: fingerprint count is ~2/(w+1) of grams, never above window count") {
    val s = spark
    import s.implicits._
    val text = (1 to 200).map(i => s"w${i * 7 % 97}x").mkString(" ")
    val n = Dedup.winnowFingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "text", "doc_id", K, W).count()
    val normLen = text.toLowerCase.replaceAll("[^a-z0-9]", "").length
    val grams = normLen - K + 1
    val windows = grams - W + 1
    assert(n <= windows, s"$n fingerprints from $windows windows")
    // expected density 2/(w+1) = 0.4; allow generous slack both ways
    assert(n >= grams / (W + 1) && n <= grams,
      s"density off: $n fingerprints from $grams grams")
  }

  test("maxDf cap: a boilerplate passage shared by every doc stops pairing docs") {
    val s = spark
    import s.implicits._
    val boiler = "subscribe to our newsletter for updates"
    // 12 docs, all carrying the same boilerplate, otherwise disjoint:
    // each doc's own content is runs of a single per-doc letter, so no
    // two docs share any 5-gram outside the boilerplate (junction grams
    // carry the doc letter and stay per-doc)
    val docs = (0 until 12).map { i =>
      val u = ('a' + i).toChar.toString * 10
      (i.toLong + 1, s"$u $boiler ${u}qq")
    }.toDF("doc_id", "text")
    // reference pair sets under the cap: fingerprints with df > maxDf
    // are dropped BEFORE pairing (window competition at the unique/boiler
    // junctions legitimately leaves some boiler fingerprints below df=12,
    // so the expectation is computed, not assumed)
    val docRows = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val refFps = docRows.map { case (id, t) => id -> refWinnow(t).map(_._2) }.toMap
    def refPairs(maxDf: Int): Set[(Long, Long)] = {
      val df = refFps.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val kept = refFps.view.mapValues(_.filter(h => df(h) <= maxDf)).toMap
      (for {
        (a, fa) <- kept.toSeq; (b, fb) <- kept.toSeq
        if a < b && fa.intersect(fb).nonEmpty
      } yield (a, b)).toSet
    }
    for (cap <- Seq(2, 5, 50)) {
      val got = Dedup.winnowCandidates(docs, "text", "doc_id", K, W,
          minShared = 1, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == refPairs(cap), s"cap=$cap: got ${got.size} want ${refPairs(cap).size}")
    }
    // and the cap must bite: the full boilerplate (df=12) pairs all 66
    // when allowed, fewer when capped at 5
    assert(refPairs(50).size == 66 && refPairs(5).size < 66,
      s"fixture sanity: ${refPairs(50).size} vs ${refPairs(5).size}")
  }
}
