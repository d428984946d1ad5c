package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns.
  *
  * The composed-builtin version ([[graft.operators.Similarity.cosine]])
  * makes THREE passes over boxed array elements (`zip_with` + two
  * `transform`s, each folded by `aggregate`) and allocates an intermediate
  * array per pass per row. This expression computes dot product and both
  * norms in ONE fused loop over the unboxed `ArrayData` buffers, and
  * participates in whole-stage codegen via [[doGenCode]] — the preferred
  * shape for a hot scalar kernel (custom `Expression` beats UDF; see
  * SURVEY §2.9).
  *
  * Semantics are bit-identical to the composed version on equal-length
  * arrays: each accumulator folds left-to-right in index order in double
  * precision, so the DuckDB oracle's identical fold hash-matches. A null
  * array, any null element, OR a length mismatch yields null — the same
  * rule as [[ArrayDotLong]] and the composed form (`zip_with` pads the
  * short side with null and the fold poisons): a silent prefix cosine on
  * a corrupt/mixed-dimension embedding would be a plausible-but-wrong
  * similarity flowing into dedup/ANN decisions, not an error.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer dot product over two `array<long>` columns (the SQ8 code
  * scan's inner loop): one fused unboxed pass, exact in int64
  * (|x|,|y| ≤ 127 ⇒ no overflow at any real dimension), codegen'd.
  * Value-identical to `aggregate(zip_with(x, y, _*_), 0L, _+_)`
  * INCLUDING on ragged inputs: a length mismatch yields null (the
  * composed form's zip_with pads with null and the fold poisons) — a
  * silent prefix dot for corrupt/mixed-dimension codes would be a
  * wrong similarity, not an error. Null array or element → null.
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $x.numElements();
         |long $dot = 0L;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += $x.getLong($i) * $y.getLong($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused ±1 random projection kernel (Achlioptas JL): maps an
  * `array<float>` of at least `dIn` elements to `array<double>` of
  * `dOut`, `out[j] = (Σ_i ±x_i) / sqrt(dOut)` with the sign matrix a
  * row-major constant (`1` = +, `0` = −) shipped once per task as a
  * reference object — NOT as literal expression nodes: the composed
  * column-algebra form unrolls dOut×dIn add terms, overflows the 64 KB
  * codegen method limit and drops the whole stage to interpreted eval.
  * Fold semantics per output dim: index order, double precision,
  * starting from 0.0 — bit-identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, …))`. Null array, null element, or an
  * input shorter than `dIn` yields null.
  */
case class SignedProject(child: Expression, signs: Array[Byte], dOut: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val dIn = signs.length / dOut
  require(dOut >= 1 && dIn * dOut == signs.length,
    s"SignedProject: signs length ${signs.length} not divisible by dOut $dOut")

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dIn) return null
    val out = new Array[Double](dOut)
    val inv = math.sqrt(dOut.toDouble)
    var j = 0
    while (j < dOut) {
      var acc = 0.0
      var i = 0
      while (i < dIn) {
        if (x.isNullAt(i)) return null
        val xi = x.getFloat(i).toDouble
        acc += (if (signs(j * dIn + i) != 0) xi else -xi)
        i += 1
      }
      out(j) = acc / inv
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val xi = ctx.freshName("xi")
      val inv = ctx.freshName("inv")
      s"""
         |if ($x.numElements() < $dIn) { ${ev.isNull} = true; } else {
         |  double[] $out = new double[$dOut];
         |  double $inv = java.lang.Math.sqrt((double) $dOut);
         |  for (int $j = 0; !${ev.isNull} && $j < $dOut; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dIn; $i++) {
         |      if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $xi = (double) $x.getFloat($i);
         |      $acc += ($signsRef[$j * $dIn + $i] != 0) ? $xi : -$xi;
         |    }
         |    $out[$j] = $acc / $inv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused logistic margin `w · [x, 1]` — weight vector of length d+1 (last
  * entry = bias) against the first d elements of an `array<float>` or
  * `array<double>` column, with the weights shipped once per task as a
  * reference object. The composed column-algebra form unrolls d+1 chained
  * `element_at` multiply-adds per row; past a few hundred dims that
  * overflows the 64 KB Janino method limit and silently drops the whole
  * stage to interpreted eval — the exact pitfall [[SignedProject]] exists
  * to avoid, and `scoreWithWeights` is exposed to arbitrary dims via the
  * score-logistic IR action.
  *
  * Fold semantics: index order, double precision, starting from 0.0 (the
  * DuckDB oracle's `list_reduce(list_prepend(0.0, …))` convention), bias
  * added last. Value-identical to the old unrolled `reduceLeft` in every
  * downstream use: the two can differ only in the SIGN of a zero margin,
  * and the margin feeds only the algebraic sigmoid, where
  * `±0.0 → exactly 0.5`.
  *
  * A vector SHORTER than d fails loudly with the cause (the unrolled
  * form's ANSI `element_at` also raised, less legibly); extra elements
  * beyond d are ignored, matching the unrolled form. Null array or null
  * element within the first d → null.
  */
case class MarginDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  private val d = weights.length - 1
  require(d >= 0, "MarginDot: weights must at least carry a bias entry")

  // TypeCollection is private[sql], so the float-or-double union is
  // checked by hand instead of via ExpectsInputTypes
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MarginDot needs array<float> or array<double>, got ${other.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"MarginDot: vector has ${x.numElements()} elements, model dim is $d")
    var acc = 0.0
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) return null
      acc += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * weights(i)
      i += 1
    }
    acc + weights(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getter = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "MarginDot: vector has " + $x.numElements() + " elements, model dim is $d");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $getter * $wRef[$i];
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc + $wRef[$d]; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  /** `array<float>` cosine similarity as a codegen'd native kernel. */
  def cosineF(a: Column, b: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(CosineSimilarity(B.expression(a), B.expression(b)))
  }

  /** Exact int64 dot product of two `array<long>` code vectors.
    * Measured 6× over the composed `aggregate(zip_with(·,·,_*_))` form
    * on the sq8 10M-pair scan (6.6 s → 1.1 s at ×10 local[32]). A
    * sibling fused-L2 expression for the PQ encode loop was measured
    * SLOWER than the composed form there and deliberately not kept.
    */
  def dotL(a: Column, b: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(ArrayDotLong(B.expression(a), B.expression(b)))
  }

  /** Fused ±1 JL projection of an `array<float>` column. `signs` is the
    * row-major dOut×dIn sign matrix as ±1.0 doubles (the driver-side
    * [[graft.operators.Similarity.projectionSigns]] output).
    */
  def signedProject(vec: Column, signs: Array[Array[Double]]): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    val flat = signs.flatMap(_.map(s => if (s > 0) 1.toByte else 0.toByte))
    B.column(SignedProject(B.expression(vec), flat, signs.length))
  }

  /** Fused logistic margin `w · [x, 1]` over an `array<float|double>`
    * column — `w` length d+1, last entry the bias. Janino-safe at any
    * model dimension (see [[MarginDot]]).
    */
  def marginDot(vec: Column, w: Array[Double]): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(MarginDot(B.expression(vec), w))
  }
}
