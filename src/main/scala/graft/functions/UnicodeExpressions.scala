package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen'd Catalyst expression —
  * the cleanup every multilingual corpus needs BEFORE hashing, dedup or
  * tokenization: the same text arrives from the web in composed and
  * decomposed forms (`é` vs `e`+U+0301), and un-normalized corpora leak
  * duplicates past every exact hash. The K forms additionally fold
  * compatibility variants (full-width ASCII, ligatures, superscripts) —
  * the standard choice for tokenizer training (SentencePiece defaults to
  * NFKC).
  *
  * Implementation: `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of the Unicode standard) behind a
  * whole-stage-codegen'd unary expression — one static call per row, no
  * scalar UDF, no interpreted fallback. The NFC face is oracle-gated
  * against DuckDB's `nfc_normalize` (two independent implementations of
  * UAX #15 must agree byte-for-byte); NFKC/NFD/NFKD have no DuckDB
  * builtin and are spec-gated on the standard's own laws (idempotence,
  * composition, compatibility folding).
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression with ExpectsInputTypes {

  // validated eagerly so a bad form fails at plan time, not per row
  @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(formName),
    s"unicode_normalize: form must be NFC|NFD|NFKC|NFKD, got '$formName'")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$formName))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** `unicodeNormalize(col, "NFKC")` — normalized string Column. */
  def apply(c: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))

  /** NFC — canonical composition (the DuckDB-parity form). */
  def nfc(c: Column): Column = apply(c, "NFC")

  /** NFKC — compatibility composition (the tokenizer-training default). */
  def nfkc(c: Column): Column = apply(c, "NFKC")
}
