package graft

import graft.functions.Compress
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compression-ratio quality signal: the codegen'd DeflateLength
  * expression against a direct JDK Deflater reference, the
  * repetition-monotonicity law the heuristic exists for, totality, and
  * the IR action. Corpus plumbing is gated rows-only
  * (`compression_ratio` — DuckDB has no deflate).
  */
class CompressSpec extends AnyFunSuite {
  import TestSpark.spark

  private def refLen(s: String, level: Int = 6): Long = {
    val d = new java.util.zip.Deflater(level, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var t = 0L
    while (!d.finished()) t += d.deflate(buf)
    d.end(); t
  }

  test("DeflateLength: byte-exact vs a direct JDK reference, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "plain natural prose with a few words",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      ("spam phrase " * 50).trim,
      scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(200).mkString,
      "")
    val df = texts.toDF("t")
      .select(col("t"), Compress.deflateLength(encode(col("t"), "UTF-8")).as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(got(t) == refLen(t), s"mismatch for '$t'"))
    // interpreted path (codegen off) agrees
    val off = df.sparkSession.conf.get("spark.sql.codegen.wholeStage", "true")
    df.sparkSession.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = texts.toDF("t")
        .select(col("t"), Compress.deflateLength(encode(col("t"), "UTF-8")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(interp == got)
    } finally df.sparkSession.conf.set("spark.sql.codegen.wholeStage", off)
  }

  test("compressionRatio: repetition compresses, gibberish does not; empty is null") {
    val s = spark
    import s.implicits._
    val rnd = scala.util.Random.javaRandomToRandom(new java.util.Random(11))
    val df = Seq(
      ("rep", ("the same line again and again. " * 40).trim),
      ("prose", "A reasonably ordinary paragraph about crawling the web, " +
        "followed by sentences that each say something different. The " +
        "fetcher discovers new hosts from sitemaps and link graphs, " +
        "schedules them politely under their declared delays, and lands " +
        "archives in a directory the indexer watches. Extracted text " +
        "flows through quality filters before any deduplication pass " +
        "touches it, because order matters for reproducibility."),
      ("noise", rnd.alphanumeric.take(600).mkString),
      ("empty", "")).toDF("k", "t")
      .select(col("k"), Compress.compressionRatio(col("t")).as("r"))
    val m = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any])).toMap
    val rep = m("rep").asInstanceOf[Double]
    val prose = m("prose").asInstanceOf[Double]
    val noise = m("noise").asInstanceOf[Double]
    assert(rep < prose && prose < noise, m.toString)
    assert(rep < 0.2 && noise > 0.7, m.toString)
    assert(m("empty") == null)
  }

  test("compression-ratio is a declarable IR action") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val out = Engine.run(Node.fromJson(
        """{"action":"compression-ratio","params":[{"text":"t","out":"cr"}],
          | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      Seq("xyxyxyxyxyxyxyxyxyxyxyxyxyxy").toDF("t"),
      EngineCtx(testMode = true)).taps("out").collect().head
    assert(out.getAs[Double]("cr") > 0 && out.getAs[Double]("cr") < 1)
  }
}
