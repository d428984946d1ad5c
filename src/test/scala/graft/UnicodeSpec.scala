package graft

import graft.functions.UnicodeNormalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode normalization laws (UAX #15) through the codegen'd
  * expression: composition/decomposition, compatibility folding,
  * idempotence, totality, SQL==Column parity, and the IR action. The
  * NFC face is oracle-gated against DuckDB's independent implementation
  * (`nfc_normalize`). Non-ASCII fixture strings are BUILT from integer
  * code points so composed-vs-decomposed intent is unambiguous in the
  * source bytes.
  */
class UnicodeSpec extends AnyFunSuite {
  import TestSpark.spark

  GraftExtensions.register(spark)

  private def cp(points: Int*): String =
    points.map(Character.toChars(_).mkString).mkString

  private val ComposedE = "caf" + cp(0xE9)          // cafe with U+00E9
  private val DecomposedE = "cafe" + cp(0x301)      // e + combining acute
  private val ComposedRing = cp(0xC5)               // A-ring composed
  private val DecomposedRing = "A" + cp(0x30A)      // A + combining ring
  private val Fullwidth = cp(0xFF21, 0xFF22, 0xFF23) // fullwidth ABC
  private val Ligature = cp(0xFB01) + "le"          // fi ligature + le
  private val Super2 = "x" + cp(0xB2)               // superscript two

  private def norm(s: String, form: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t").select(UnicodeNormalize(col("t"), form)).collect().head.getString(0)
  }

  test("NFC composes, NFD decomposes, both idempotent") {
    assert(norm(DecomposedE, "NFC") == ComposedE)
    assert(norm(ComposedE, "NFD") == DecomposedE)
    assert(norm(DecomposedRing, "NFC") == ComposedRing)
    assert(norm(norm(DecomposedE, "NFC"), "NFC") == norm(DecomposedE, "NFC"))
    assert(norm("plain ascii 123", "NFC") == "plain ascii 123")
  }

  test("NFKC folds compatibility variants: fullwidth, ligature, superscript") {
    assert(norm(Fullwidth, "NFKC") == "ABC")
    assert(norm(Ligature, "NFKC") == "file")
    assert(norm(Super2, "NFKC") == "x2")
    // NFC leaves compatibility variants alone -- the forms are distinct
    assert(norm(cp(0xFF21), "NFC") == cp(0xFF21))
  }

  test("null passthrough; bad form rejected") {
    val sp = spark
    import sp.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(UnicodeNormalize(col("t"), "NFKC")).collect().head
    assert(out.isNullAt(0))
    val e = intercept[Throwable] {
      Seq("x").toDF("t").select(UnicodeNormalize(col("t"), "NFX")).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("NFC|NFD|NFKC|NFKD"))
        || mentions(t.getCause))
    assert(mentions(e), s"unexpected error: $e")
  }

  test("SQL face == Column face == JDK Normalizer reference") {
    val sp = spark
    import sp.implicits._
    // U+01FA (A with ring and acute) exercises multi-mark recomposition
    val inputs = Seq(DecomposedE, Fullwidth, "ma" + cp(0xF1) + "ana", cp(0x1FA))
    val df = inputs.toDF("t")
    df.createOrReplaceTempView("uni_t")
    val viaSql = spark.sql("SELECT unicode_normalize(t, 'NFKC') FROM uni_t")
      .collect().map(_.getString(0)).toSeq
    val viaCol = df.select(UnicodeNormalize.nfkc(col("t")))
      .collect().map(_.getString(0)).toSeq
    val viaJdk = inputs.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFKC))
    assert(viaSql == viaCol && viaCol == viaJdk)
  }

  test("unicode-normalize is a declarable IR action (NFKC default)") {
    import graft.ir.{Engine, EngineCtx, Node}
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, DecomposedE + " " + cp(0xFF21))).toDF("id", "text")
    val out = Engine.run(Node.fromJson(
      """{"action":"unicode-normalize","params":[{"field":"text","out":"norm"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    assert(out.collect().head.getAs[String]("norm") == ComposedE + " A")
  }
}
