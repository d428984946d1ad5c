package graft

import graft.functions.ByteLevel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GPT-2 byte-level representation: the bytes_to_unicode bijection
  * pinned at the published table's anchor points, lossless round trips
  * over arbitrary bytes, the pretokenizer's contraction/category
  * splits, and the IR actions. The corpus-level pretoken counting is
  * oracle-gated (`bytelevel_pretokens`).
  */
class ByteLevelSpec extends AnyFunSuite {
  import TestSpark.spark

  private def bl(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(ByteLevel.toByteLevel(col("t"))).collect().head.getString(0)
  }
  private def unbl(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(ByteLevel.fromByteLevel(col("t"))).collect().head.getString(0)
  }

  test("ByteToChar is the published GPT-2 map: bijection + anchor points") {
    assert(ByteLevel.ByteToChar.distinct.length == 256)
    assert(ByteLevel.ByteToChar('A') == 'A' && ByteLevel.ByteToChar('~') == '~')
    assert(ByteLevel.ByteToChar(32) == 'Ġ')  // space -> Ġ
    assert(ByteLevel.ByteToChar(10) == 'Ċ')  // \n -> Ċ
    assert(ByteLevel.ByteToChar(9) == 'ĉ')   // \t -> ĉ
    assert(ByteLevel.ByteToChar(0) == 'Ā')   // NUL -> Ā
    assert(ByteLevel.ByteToChar(127) == 'ġ') // DEL -> ġ
    assert(ByteLevel.ByteToChar(173) == 'Ń') // soft hyphen -> Ń
    assert(ByteLevel.ByteToChar(0xFF) == 'ÿ')     // kept printable
  }

  test("toByteLevel: whitespace-free, lossless; fromByteLevel inverts") {
    assert(bl("hello world") == "helloĠworld")
    assert(bl("a\nb\tc") == "aĊbĉc")
    // multi-byte UTF-8: é = 0xC3 0xA9 -> Ã(kept) + mapped 0xA9 (gap -> ©? 0xA9 is in the
    // kept ¡–¬ range: stays ©... 0xA9=169 kept) — just assert the round trip
    for (s <- Seq("café", "naïve — done", "emoji 🚀 ok", "", "plain"))
      assert(unbl(bl(s)) == s, s"round trip failed for '$s'")
    // byte-level output never contains raw space
    assert(!bl("  a  b  ").contains(" "))
  }

  test("fromByteLevel is total on garbage") {
    // chars outside the alphabet and invalid reassembled bytes survive
    // as ? / U+FFFD instead of throwing
    assert(unbl("Ω≠alphabet") == "?≠alphabet".replace("≠", "?"))
    assert(unbl("Ã") == "�") // lone UTF-8 lead byte
  }

  test("pretokens: contraction and category splits, leading-space glue") {
    import spark.implicits._
    val toks = Seq("He can't stop... adding 42 tokens")
      .toDF("t").select(ByteLevel.pretokens(col("t")).as("p"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("He", "Ġcan", "'t", "Ġstop", "...", "Ġadding", "Ġ42", "Ġtokens"))
    val n = Seq("one two three").toDF("t")
      .select(ByteLevel.pretokenCount(col("t"))).collect().head.getLong(0)
    assert(n == 3L)
  }

  test("byte-level / byte-level-decode / byte-level-pretokens IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq("round trip me").toDF("text")
    val out = Engine.run(Node.fromJson(
        """{"action":"byte-level","params":[{"field":"text","out":"b"}],"children":[
          | {"action":"byte-level-decode","params":[{"field":"b","out":"back"}],"children":[
          |  {"action":"byte-level-pretokens","params":[{"text":"text"}],"children":[
          |   {"action":"tap","params":["out"]}]}]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out").collect().head
    assert(out.getAs[String]("b") == "roundĠtripĠme")
    assert(out.getAs[String]("back") == "round trip me")
    assert(out.getSeq[String](out.fieldIndex("pretokens")).toSeq
      == Seq("round", "Ġtrip", "Ġme"))
  }
}
