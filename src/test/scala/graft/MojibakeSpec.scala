package graft

import java.nio.charset.{Charset, StandardCharsets}

import graft.functions.Mojibake
import graft.ir.{Engine, EngineCtx, Node}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mojibake detection/repair laws. The pair table is PROVEN, not
  * trusted: every (artifact, clean) pair is rebuilt by actually
  * misdecoding the clean character's UTF-8 bytes as windows-1252 —
  * the exact corruption the operator models — and the repair must
  * invert a real end-to-end misdecode of a full sentence.
  */
class MojibakeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Cp1252 = Charset.forName("windows-1252")

  private def misdecode(clean: String): String =
    new String(clean.getBytes(StandardCharsets.UTF_8), Cp1252)

  private def one(c: org.apache.spark.sql.Column, s: String): Any = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t").select(c).collect().head.get(0)
  }

  test("every repair pair IS the cp1252 misdecode of its clean char") {
    Mojibake.DefaultRepairs.foreach { case (artifact, clean) =>
      assert(misdecode(clean) == artifact,
        s"pair table drift: misdecode('$clean') = '${misdecode(clean)}' != '$artifact'")
    }
  }

  test("repair inverts a real end-to-end misdecode; clean text is a fixed point") {
    val clean = "don’t stop at the café — it’s ‘nice’… naïve? no: £5, 30°, ©2024, große ñoño"
    // naïve's ï (C3 AF) and große's ß (C3 9F, hits undefined 0x9F) are
    // NOT in the table — the repair contract is the table's pairs only,
    // so compare against the table-scoped expectation.
    val dirty = misdecode(clean)
    val repaired = one(Mojibake.repair(col("t")), dirty).asInstanceOf[String]
    val expected = Mojibake.DefaultRepairs.foldLeft(dirty) {
      case (acc, (bad, good)) => acc.replace(bad, good)
    }
    assert(repaired == expected)
    // every table character in the sentence came back clean
    Mojibake.DefaultRepairs.foreach { case (artifact, good) =>
      if (clean.contains(good)) {
        assert(!repaired.contains(artifact))
        assert(repaired.contains(good))
      }
    }
    // clean text with real accents is untouched (no false rewrites)
    assert(one(Mojibake.repair(col("t")), clean) == clean)
  }

  test("hits counts artifacts; score rates per char; clean scores zero") {
    val dirty = misdecode("café’s £5…")                // é ’ £ … → 4 artifacts
    assert(one(Mojibake.hits(col("t")), dirty) == 4L)
    assert(one(Mojibake.hits(col("t")), "plain ascii text") == 0L)
    assert(one(Mojibake.hits(col("t")), "café — real unicode, ‘fine’") == 0L)
    assert(one(Mojibake.score(col("t")), "clean") == 0.0)
    assert(one(Mojibake.score(col("t")), "") == 0.0)
    val d = misdecode("é")                              // "Ã©": 2 chars, 1 hit
    assert(one(Mojibake.score(col("t")), d) == 0.5)
    // the bare replacement char counts even though it is unrepairable
    assert(one(Mojibake.hits(col("t")), "lost � bytes") == 1L)
  }

  test("signals bundles the verdict; null/empty text is total") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, misdecode("don’t — café")),
      (2L, "pristine prose with enough length to pass any rate"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("id", "t")
      .select(col("id"), Mojibake.signals(col("t"), maxScore = 0.01).as("m"))
      .select(col("id"), col("m.moji_hits"), col("m.moji_score"), col("m.keep"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rows(1L)._1 == 3L && rows(1L)._3 == 0L)
    assert(rows(2L) == ((0L, 0.0, 1L)))
    assert(rows(3L) == ((0L, 0.0, 1L)))
    assert(rows(4L) == ((0L, 0.0, 1L)))
  }

  test("IR mojibake-repair and mojibake-filter") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, misdecode("café society — don’t")),
      (2L, "clean page, long enough that one artifact would still pass nothing"))
      .toDF("id", "t")
    val fixed = Engine.run(Node.fromJson(
      """{"action":"mojibake-repair","params":[{"field":"t","out":"t2"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fixed(1L) == "café society — don’t")
    assert(fixed(2L).startsWith("clean page"))

    val kept = Engine.run(Node.fromJson(
      """{"action":"mojibake-filter","params":[{"text":"t","max-score":0.01}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), "the corrupted page is dropped, the clean one kept")
  }
}
