package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compression-ratio quality signal (the MassiveText/Gopher-family
  * heuristic): highly repetitive machine-generated text deflates far
  * below natural prose, and near-random gibberish barely deflates at
  * all — so `deflated_bytes / raw_bytes` separates boilerplate spam
  * (low) and encoding junk (high) from keepable text (middle band).
  *
  * [[DeflateLength]] is a codegen'd Catalyst expression around the
  * JDK's raw Deflater (zlib, fixed level, no header) — one streaming
  * pass per row, a reused task-local buffer, no UDF boxing. The length
  * is deterministic for a fixed level and zlib build; DuckDB has no
  * deflate, so the corpus gate is rows-only and the semantics are
  * spec-pinned (monotone under repetition, byte-exact against a direct
  * JDK reference).
  */
object Compress {

  // per-row 8 KB allocations would be pure GC churn in a corpus scan
  private val threadBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Raw-deflate byte length at `level` — the Expression's kernel
    * (also codegen-called). */
  def deflatedLength(bytes: Array[Byte], level: Int): Long = {
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes); d.finish()
      val buf = threadBuf.get()
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Deflated byte length of a binary column. */
  def deflateLength(c: Column, level: Int = 6): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(DeflateLength(B.expression(c), level))
  }

  /** `deflated / raw` over a text column's UTF-8 bytes; null for empty
    * text (no bytes to judge). */
  def compressionRatio(c: Column, level: Int = 6): Column = {
    val bytes = encode(c, "UTF-8")
    when(length(bytes) > 0,
      deflateLength(bytes, level).cast("double") / length(bytes).cast("double"))
      .otherwise(lit(null).cast("double"))
  }
}

/** Deflated byte length of a binary child — see [[Compress]]. */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Compress.deflatedLength(input.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Compress.deflatedLength($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
