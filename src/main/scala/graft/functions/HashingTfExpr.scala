package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** The hashing trick (Weinberger et al. 2009): a token array folded into
  * a FIXED-dim term-frequency vector by hashing each token to a bucket —
  * the vocabulary-free featurizer that turns raw text into
  * [[graft.operators.Training]] classifier input with zero fitted state
  * (no vocabulary build, no shuffle, no OOV problem; quality/langid
  * fastText-style filters train straight off the corpus).
  *
  * Bucket = `md5Hash64(seed + ":" + token) % dim` — the repo's
  * engine-portable hash ([[Text.md5Hash64]] / [[CountMin.md5Hash64]]),
  * so the oracle replays the exact vector. Single pass over the tokens
  * (O(tokens), not the O(dim × tokens) a Column-algebra `transform`
  * would pay), whole-stage-codegen'd via a static kernel call.
  */
case class HashingTfExpr(child: Expression, dim: Int, seed: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim >= 1, s"hashing_tf: dim must be >= 1, got $dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    HashingTfExpr.fill(a.asInstanceOf[ArrayData], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seed", seed, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashingTfExpr.fill($c, $dim, $seedRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashingTfExpr =
    copy(child = newChild)
}

object HashingTfExpr {

  /** The kernel — static so generated code calls it directly. */
  def fill(a: ArrayData, dim: Int, seed: String): ArrayData = {
    val out = new Array[Double](dim)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i).toString
        out((CountMin.md5Hash64(seed + ":" + t) % dim).toInt) += 1.0
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `hashingTf(tokensCol, dim, seed)` → fixed-dim `array<double>`. */
  def apply(c: Column, dim: Int, seed: String = "htf"): Column =
    Bridge.column(HashingTfExpr(Bridge.expression(c), dim, seed))
}
