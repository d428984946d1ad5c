package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 §4) as ONE fused Catalyst expression: hash every char
  * `k`-gram (md5-prefix convention, [[CountMin.md5Hash64]] — the JVM twin
  * of [[Text.md5Hash64]], so the DuckDB oracle replays it), slide a
  * window of `w` hashes, keep each window's minimum with rightmost
  * tie-break, dedupe consecutive selections.
  *
  * Why an expression and not column algebra: the algebraic form
  * (`transform(sequence(...), j -> aggregate(slice(grams, j, w), ...))`)
  * textually inlines the gram array into EVERY window's fold — Catalyst
  * has no let-binding, so `n` windows recompute all `n` gram hashes:
  * O(n²·k) md5 calls per document. The fused kernel hashes each gram
  * once and selects minima with a monotonic deque — O(n·k) total,
  * amortized O(1) per window — the difference between minutes and
  * milliseconds on a 300-char doc, and between feasible and not at
  * 100 TB.
  */
object Winnow {

  /** Kernel: selected fingerprints of a NORMALIZED string as parallel
    * (pos, hash) arrays — 1-based gram offsets, distinct selections in
    * first-selection order. Shared by interpreted and codegen paths.
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val t = if (text == null) "" else text.toString
    val nGrams = t.length - k + 1
    if (nGrams < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hs(i) = CountMin.md5Hash64(t.substring(i, i + k)); i += 1 }
    // monotonic deque of gram indices; front = window min; equal hashes
    // pop from the back so the RIGHTMOST minimum survives (the paper's
    // robust-winnowing tie rule)
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val sel = new java.util.LinkedHashSet[Integer]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val j = i - w + 1 // window start index
      if (j >= 0) {
        while (deque(head) < j) head += 1
        sel.add(deque(head))
      }
      i += 1
    }
    val rows = new Array[Any](sel.size)
    val it = sel.iterator()
    var r = 0
    while (it.hasNext) {
      val idx = it.next().intValue()
      rows(r) = InternalRow((idx + 1).toLong, hs(idx)); r += 1
    }
    new GenericArrayData(rows)
  }

  val fingerprintType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  /** Selected `(pos, h)` fingerprint structs of a normalized text column. */
  def select(c: Column, k: Int, w: Int): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(WinnowSelect(B.expression(c), k, w))
  }
}

/** Winnowing selection over a string child — see [[Winnow]]. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"WinnowSelect: k must be >= 1, got $k")
  require(w >= 1, s"WinnowSelect: w must be >= 1, got $w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = Winnow.fingerprintType

  override def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
