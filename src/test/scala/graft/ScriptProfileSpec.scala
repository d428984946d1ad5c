package graft

import graft.functions.Text
import graft.ir.{Engine, EngineCtx, Node}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Writing-script profile laws: every table script detected on a pure
  * sample, counts exact on a hand-built mixed string, dominance flips
  * with composition, digits-only is unknown, null totality, IR action.
  */
class ScriptProfileSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Pure: Map[String, String] = Map(
    "latin" -> "hello world",
    "cyrillic" -> "привет мир",
    "greek" -> "γειά σου κόσμε",
    "arabic" -> "مرحبا بالعالم",
    "hebrew" -> "שלום עולם",
    "devanagari" -> "नमस्ते दुनिया",
    "cjk" -> "你好世界",
    "hangul" -> "안녕하세요",
    "kana" -> "こんにちはカタカナ")

  private def profile(s: String): (Map[String, Long], String) = {
    val sp = spark
    import sp.implicits._
    val names = Text.ScriptRanges.map(_._1)
    val r = Seq(s).toDF("t")
      .select(Text.scriptProfile(col("t")).as("p"))
      .select(names.map(n => col(s"p.n_$n")) :+ col("p.script"): _*)
      .collect().head
    (names.zipWithIndex.map { case (n, i) => n -> r.getLong(i) }.toMap,
      r.getString(names.length))
  }

  test("every script in the table dominates its own pure sample") {
    Pure.foreach { case (name, sample) =>
      val (_, script) = profile(sample)
      assert(script == name, s"expected $name for '$sample', got $script")
    }
  }

  test("counts are exact and dominance flips with composition") {
    val (counts, script) = profile("abc привет")
    assert(counts("latin") == 3L && counts("cyrillic") == 6L)
    assert(script == "cyrillic")
    val (c2, s2) = profile("abcdefg привет")
    assert(c2("latin") == 7L && s2 == "latin")
    // a tie goes to table order (latin precedes cyrillic)
    val (c3, s3) = profile("abc при")
    assert(c3("latin") == 3L && c3("cyrillic") == 3L && s3 == "latin")
  }

  test("no scripted characters -> unknown; null/empty total") {
    assert(profile("12345 !?")._2 == "unknown")
    assert(profile("")._2 == "unknown")
    val sp = spark
    import sp.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(Text.scriptProfile(col("t")).as("p"))
      .select("p.n_latin", "p.script").collect().head
    assert(r.getLong(0) == 0L && r.getString(1) == "unknown")
  }

  test("IR script-profile action") {
    val s = spark
    import s.implicits._
    val out = Engine.run(Node.fromJson(
      """{"action":"script-profile","params":[{"text":"t","out":"p"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      Seq("안녕하 hello 안녕녕").toDF("t"), EngineCtx(testMode = true)).taps("out")
      .select("p.script", "p.n_hangul", "p.n_latin").collect().head
    assert(out.getString(0) == "hangul" && out.getLong(1) == 6L && out.getLong(2) == 5L)
  }
}
