package graft

import graft.functions.Quality
import graft.ir.{Engine, EngineCtx, Node}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Readability laws: the syllable heuristic on hand-counted words, the
  * Flesch indices on a sentence with a pencil-and-paper value, sentence
  * flooring, empty/null totality, and the IR action.
  */
class ReadabilitySpec extends AnyFunSuite {
  import TestSpark.spark

  private def syl(w: String): Long = {
    val sp = spark
    import sp.implicits._
    Seq(w).toDF("t").select(Quality.syllables(col("t")))
      .collect().head.getLong(0)
  }

  test("syllable heuristic on hand-counted words") {
    assert(syl("cat") == 1L)
    assert(syl("hello") == 2L)       // e, o
    assert(syl("time") == 1L)        // i, e; silent final e
    assert(syl("table") == 2L)       // a, e; '..le' keeps its e
    assert(syl("rhythm") == 1L)      // y
    assert(syl("readability") == 5L) // ea, a, i, i, y
    assert(syl("queue") == 1L)       // one vowel run
    assert(syl("the") == 1L)         // silent-e floor: never below 1
    assert(syl("42") == 1L)          // vowelless tokens still count 1
  }

  test("Flesch indices match the pencil-and-paper value; sentences floor at 1") {
    val sp = spark
    import sp.implicits._
    // 6 words, 1 sentence, 6 syllables:
    // FRE = 206.835 - 1.015*6 - 84.6*1 = 116.145
    // FK  = 0.39*6 + 11.8*1 - 15.59 = -1.45
    val r = Seq("The cat sat on the mat.").toDF("text")
      .select(Quality.readabilitySignals(col("text")).as("r"))
      .select("r.n_words", "r.n_sentences", "r.n_syllables", "r.fre", "r.fk_grade")
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L && r.getLong(2) == 6L)
    assert(math.abs(r.getDouble(3) - 116.145) < 1e-9)
    assert(math.abs(r.getDouble(4) - (-1.45)) < 1e-9)

    // no terminal punctuation: still one sentence, not zero
    val headline = Seq("breaking news headline").toDF("text")
      .select(Quality.readabilitySignals(col("text")).as("r"))
      .select("r.n_sentences").collect().head.getLong(0)
    assert(headline == 1L)

    // "?!" and "..." runs are ONE boundary each
    val multi = Seq("Really?! Yes... done.").toDF("text")
      .select(Quality.readabilitySignals(col("text")).as("r"))
      .select("r.n_sentences").collect().head.getLong(0)
    assert(multi == 3L)
  }

  test("empty and null text are total and score zero") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), Quality.readabilitySignals(col("text")).as("r"))
      .select(col("id"), col("r.n_words"), col("r.fre"), col("r.fk_grade"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((0L, 0.0, 0.0)))
    assert(rows(2L) == ((0L, 0.0, 0.0)))
  }

  test("IR readability action") {
    val s = spark
    import s.implicits._
    val out = Engine.run(Node.fromJson(
      """{"action":"readability","params":[{"text":"text","out":"r"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      Seq("The cat sat on the mat.").toDF("text"),
      EngineCtx(testMode = true)).taps("out")
      .select("r.n_syllables").collect().head.getLong(0)
    assert(out == 6L)
  }
}
