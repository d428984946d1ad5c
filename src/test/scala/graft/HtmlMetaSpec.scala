package graft

import graft.functions.Pii
import graft.ir.{Engine, EngineCtx, Node}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rel=canonical / <title> extraction laws: both attribute orders and
  * quote styles, first-match-wins, declares-none and malformed
  * totality, null safety, IR action.
  */
class HtmlMetaSpec extends AnyFunSuite {
  import TestSpark.spark

  private def one(c: org.apache.spark.sql.Column, s: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(Option(s)).toDF("t").select(c).collect().head.getString(0)
  }

  test("canonical: both attribute orders, both quote styles, first wins") {
    assert(one(Pii.canonicalTarget(col("t")),
      """<link rel="canonical" href="http://a.com/x">""") == "http://a.com/x")
    assert(one(Pii.canonicalTarget(col("t")),
      """<LINK HREF='http://b.org/y' REL='canonical'>""") == "http://b.org/y")
    assert(one(Pii.canonicalTarget(col("t")),
      """<link rel="stylesheet" href="s.css">
        |<link rel="canonical" href="http://c.net/1">
        |<link rel="canonical" href="http://c.net/2">""".stripMargin) == "http://c.net/1")
    // declares none / malformed / null -> empty, never a failure
    assert(one(Pii.canonicalTarget(col("t")), "<head><title>t</title></head>") == "")
    assert(one(Pii.canonicalTarget(col("t")), "<link rel=canonical href=") == "")
    assert(one(Pii.canonicalTarget(col("t")), null) == "")
  }

  test("title: first match, attribute-bearing tag, totality") {
    assert(one(Pii.htmlTitle(col("t")),
      "<title>Hello World</title><title>second</title>") == "Hello World")
    assert(one(Pii.htmlTitle(col("t")),
      """<TITLE lang="en">Mixed Case</TITLE>""") == "Mixed Case")
    assert(one(Pii.htmlTitle(col("t")), "no title here") == "")
    assert(one(Pii.htmlTitle(col("t")), null) == "")
  }

  test("IR html-meta action appends both columns") {
    val s = spark
    import s.implicits._
    val out = Engine.run(Node.fromJson(
      """{"action":"html-meta","params":[{"html":"h"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      Seq("""<title>T</title><link rel="canonical" href="http://z.io/p">""").toDF("h"),
      EngineCtx(testMode = true)).taps("out")
      .select("canonical", "title").collect().head
    assert(out.getString(0) == "http://z.io/p" && out.getString(1) == "T")
  }
}
