package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-task subword-encode kernel: the trained model (BPE merge ranks /
  * WordPiece vocab) ships ONCE per task as a codegen reference object —
  * the [[CentroidKernel]] pattern — and each document is segmented
  * inside whole-stage codegen.
  *
  * This replaces the `Dataset.mapPartitions` encode faces, whose
  * row-at-a-time object boundary cost a full
  * DeserializeToObject/SerializeFromObject round trip per row (every
  * input column deserialized to a boxed `Row`, the output re-encoded to
  * unsafe rows) and broke the surrounding WholeStageCodegen span. The
  * per-word loops themselves are genuinely imperative (rank-priority
  * merge / greedy longest-match) and stay as the same JVM methods the
  * mapPartitions face called — only the row plumbing changes, so token
  * output is bit-identical (gated by the 11 tokenizer oracle gates).
  *
  * Output contract (the mapPartitions face's exact rule): null text →
  * EMPTY array, never null; tokens are the per-word kernel outputs
  * concatenated in word order.
  */
abstract class SubwordKernel extends Serializable {
  /** Subword tokens for one document; called per row from both the
    * interpreted and the codegen path.
    */
  final def encode(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = graft.operators.Tokenizer.tokenizeWords(text.toString)
    val out = Array.newBuilder[Any]
    words.foreach { w =>
      encodeWord(w).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.result())
  }
  def encodeWord(word: String): Seq[String]
}

/** Rank-priority BPE application ([[graft.operators.Tokenizer.encodeWord]]). */
final class BpeEncodeKernel(merges: Seq[(String, String)]) extends SubwordKernel {
  private val rankOf: Map[(String, String), Int] = merges.zipWithIndex.toMap
  override def encodeWord(word: String): Seq[String] =
    graft.operators.Tokenizer.encodeWord(word, rankOf)
}

/** Greedy longest-match WordPiece segmentation
  * ([[graft.operators.WordPiece.encodeWord]]).
  */
final class WordPieceEncodeKernel(vocab: Set[String], unk: String)
    extends SubwordKernel {
  override def encodeWord(word: String): Seq[String] =
    graft.operators.WordPiece.encodeWord(word, vocab, unk)
}

/** `string → array<string>` subword encode as a codegen expression, the
  * model shipped per task via [[SubwordKernel]]. Never null (null text
  * yields the empty array — the mapPartitions face's rule).
  */
case class SubwordEncode(child: Expression, kernel: SubwordKernel)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.encode(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kref = ctx.addReferenceObj("subwordKernel", kernel,
      classOf[SubwordKernel].getName)
    val childGen = child.genCode(ctx)
    val adt = classOf[ArrayData].getName
    ev.copy(
      code = childGen.code + code"""
        |$adt ${ev.value} = $kref.encode(${childGen.isNull} ? null : ${childGen.value});
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
