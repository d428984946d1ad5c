package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance scoring (Xie et al. 2023): the hashed-bigram model
  * prefers target-like documents, the log score agrees with a
  * driver-side reference fit, and Gumbel resampling keeps ~fraction
  * with a bias toward high scores.
  */
class ImportanceSpec extends AnyFunSuite {
  import TestSpark._

  // target speaks "alpha beta"; raw is mostly "delta epsilon" noise plus
  // two target-like docs
  private def corpora() = {
    val s = spark
    import s.implicits._
    val target = (0L until 20L)
      .map(i => (i, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = (
      (100L until 130L).map(i => (i, "delta epsilon delta epsilon zeta")) ++
        Seq((200L, "alpha beta alpha beta"), (201L, "beta alpha beta alpha"))
      ).toDF("doc_id", "text")
    (raw, target)
  }

  test("logScore ranks target-like raw docs above off-distribution docs") {
    val (raw, target) = corpora()
    val scores = Importance.logScore(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val noise = (100L until 130L).map(scores)
    assert(scores(200L) > noise.max, s"target-like doc must outscore noise: $scores")
    assert(scores(201L) > noise.max)
    // every doc scored exactly once, none dropped
    assert(scores.size == 32)
  }

  test("logScore matches a driver-side reference fit of the same model") {
    val (raw, target) = corpora()
    val b = 64
    def grams(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.zip(toks.drop(1)).map { case (x, y) => s"$x $y" }.toSeq
    }
    def bucket(g: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.take(15), 16) % 1000000007L) % b
    }
    val targetRows = (0L until 20L).map(_ => "alpha beta alpha beta alpha beta")
    val rawRows = (100L until 130L).map(_ => "delta epsilon delta epsilon zeta") ++
      Seq("alpha beta alpha beta", "beta alpha beta alpha")
    val ct = targetRows.flatMap(grams).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cr = rawRows.flatMap(grams).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum + b, cr.values.sum + b)
    def ratio(bk: Long): Double =
      ((ct.getOrElse(bk, 0L) + 1).toDouble * tr.toDouble) /
        ((cr.getOrElse(bk, 0L) + 1).toDouble * tt.toDouble)
    val expected = grams("alpha beta alpha beta").map(g => math.log(ratio(bucket(g)))).sum
    val got = Importance.logScore(corpora()._1, corpora()._2, "doc_id", "text", b)
      .filter(col("doc_id") === 200L).head().getDouble(2)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("ratioSum: gram counts exact, empty docs score zero, fold is replayable") {
    val s = spark
    import s.implicits._
    val (raw0, target) = corpora()
    val raw = raw0.unionAll(Seq((300L, "solo")).toDF("doc_id", "text")) // no bigrams
    val out = Importance.ratioSum(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(300L) == ((300L, 0L, 0.0)))
    assert(byId(200L)._2 == 3L) // "alpha beta alpha beta" → 3 bigrams
    assert(byId(100L)._2 == 4L)
    // deterministic across runs (the sorted-fold guarantee)
    val again = Importance.ratioSum(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("resample keeps roughly the fraction and is biased toward high log_w") {
    val s = spark
    import s.implicits._
    // 500 docs: ids < 250 score high (+3), rest low (-3)
    val scored = (0L until 500L)
      .map(i => (i, if (i < 250) 3.0 else -3.0))
      .toDF("doc_id", "log_w")
    val kept = Importance.resample(scored, "doc_id", "log_w", fraction = 0.3,
      seed = "spec")
      .collect().map(_.getLong(0))
    assert(kept.length >= 100 && kept.length <= 200,
      s"~30% of 500 expected, got ${kept.length}")
    val highShare = kept.count(_ < 250).toDouble / kept.length
    assert(highShare > 0.9, s"high scorers should dominate, got $highShare")
    // deterministic for a fixed seed
    val again = Importance.resample(scored, "doc_id", "log_w", 0.3, "spec")
      .collect().map(_.getLong(0))
    assert(again.sorted.toSeq == kept.sorted.toSeq)
    intercept[IllegalArgumentException] {
      Importance.resample(scored, "doc_id", "log_w", 0.0)
    }
  }
}
