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

/** Shared per-task centroid-assignment kernel: the full codebook
  * (`cids` cell ids, `flat` row-major `n × dim` centroid floats) ships
  * ONCE per task as a codegen reference object, and each input vector
  * gets its top-`k` cells by cosine in one fused unboxed pass —
  * constant codegen size at any codebook size.
  *
  * This replaces the literal-expression form (`array(struct(cosineF(v,
  * typedLit(c))), …)` per centroid): that shape puts one float-array
  * literal plus a cosine sub-tree PER CENTROID into the plan, and at
  * the 65,536-cell auto cap × 64 dims that is ~4.2M literal floats in
  * the expression tree — driver-side analysis, serialization and
  * per-task binding of a multi-hundred-MB plan, the same
  * 64 KB-codegen-limit / plan-size scale-killer class [[SignedProject]]
  * and [[MarginDot]] exist to avoid.
  *
  * Output contract (bit-compatible with the literal form so every
  * ANN/semantic oracle gate hash-matches): an array of `kk = min(k, n)`
  * `struct<cc: double, negCell: long>` in DESCENDING `(cc, negCell)`
  * order — exactly `slice(reverse(array_sort(<literal array>)), 1, k)`,
  * and element 1 is exactly `array_max(<literal array>)`. Cosine
  * accumulates in double precision in index order (dot and the two
  * norms are independent fold chains, so the split loops are
  * bit-identical to [[CosineSimilarity]]'s fused one); the double
  * comparator is Spark's (`==` first, then `Double.compare` — NaN
  * largest, ±0.0 equal); ties break to the larger `negCell` (= lower
  * cell id). A null vector, any null element, or a length ≠ `dim`
  * yields null `cc` for EVERY centroid (each per-centroid cosine is
  * null in the literal form), so ordering degrades to `negCell` alone —
  * the k lowest cell ids with null scores, never a silent prefix
  * cosine.
  */
final class CentroidKernel(val cids: Array[Long], val flat: Array[Float],
                           val dim: Int, val k: Int) extends Serializable {
  private val n = cids.length
  require(n >= 1 && dim >= 1 && flat.length == n * dim,
    s"CentroidKernel: flat length ${flat.length} != n=$n x dim=$dim")
  require(k >= 1, s"CentroidKernel: k must be >= 1, got $k")
  private val kk = math.min(k, n)
  // sqrt of each centroid's norm, precomputed once: same fold sequence
  // (index-order double accumulation) as the per-row form, so
  // `sqna * sqnb(j)` is bit-identical to cosineF's
  // `sqrt(na) * sqrt(nb)`
  private val sqnb: Array[Double] = {
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      var nb = 0.0
      var i = 0
      while (i < dim) { val yi = flat(j * dim + i).toDouble; nb += yi * yi; i += 1 }
      out(j) = math.sqrt(nb)
      j += 1
    }
    out
  }

  /** Insert into the kk-slot descending buffers; returns the new fill
    * count. `ccValid = false` orders by `negCell` alone (the null-score
    * branch). Spark's double comparator: equal-first (±0.0 equal), then
    * `Double.compare` (NaN largest).
    */
  private def insert(tc: Array[Double], tn: Array[Long], filled: Int,
                     cc: Double, neg: Long, ccValid: Boolean): Int = {
    var pos = filled
    var go = true
    while (go && pos > 0) {
      val c =
        if (!ccValid) 0
        else if (cc == tc(pos - 1)) 0
        else java.lang.Double.compare(cc, tc(pos - 1))
      if (c > 0 || (c == 0 && neg > tn(pos - 1))) pos -= 1 else go = false
    }
    if (pos < kk) {
      var s = math.min(filled, kk - 1)
      while (s > pos) { tc(s) = tc(s - 1); tn(s) = tn(s - 1); s -= 1 }
      tc(pos) = cc; tn(pos) = neg
      math.min(kk, filled + 1)
    } else filled
  }

  /** Top-k cells for one vector; called per row from both the
    * interpreted and the codegen path. Never returns null (the literal
    * form's array constructor is non-null even on a null vector).
    */
  def topK(x: ArrayData): ArrayData = {
    var degenerate = x == null || x.numElements() != dim
    if (!degenerate) {
      var i = 0
      while (i < dim) {
        if (x.isNullAt(i)) { degenerate = true; i = dim } else i += 1
      }
    }
    val tc = new Array[Double](kk)
    val tn = new Array[Long](kk)
    var filled = 0
    if (degenerate) {
      var j = 0
      while (j < n) { filled = insert(tc, tn, filled, 0.0, -cids(j), ccValid = false); j += 1 }
    } else {
      var na = 0.0
      var i = 0
      while (i < dim) { val xi = x.getFloat(i).toDouble; na += xi * xi; i += 1 }
      val sqna = math.sqrt(na)
      var j = 0
      while (j < n) {
        var dot = 0.0
        val base = j * dim
        var i2 = 0
        while (i2 < dim) { dot += x.getFloat(i2).toDouble * flat(base + i2).toDouble; i2 += 1 }
        filled = insert(tc, tn, filled, dot / (sqna * sqnb(j)), -cids(j), ccValid = true)
        j += 1
      }
    }
    val rows = new Array[Any](filled)
    var s = 0
    while (s < filled) {
      rows(s) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](if (degenerate) null else tc(s), tn(s)))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** Top-k centroid cells by cosine for an `array<float>` column, the
  * codebook shipped as a [[CentroidKernel]] reference object — see the
  * kernel's scaladoc for the exact output/ordering contract. Never
  * null: a null/corrupt vector yields the k lowest cells with null
  * scores, matching the literal form it replaces.
  */
case class CentroidTopK(child: Expression, kernel: CentroidKernel)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cc", DoubleType, nullable = true),
      StructField("negCell", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    kernel.topK(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kref = ctx.addReferenceObj("centKernel", kernel,
      classOf[CentroidKernel].getName)
    val childGen = child.genCode(ctx)
    val adt = classOf[ArrayData].getName
    ev.copy(
      code = childGen.code + code"""
        |$adt ${ev.value} = $kref.topK(${childGen.isNull} ? null : ${childGen.value});
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
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

  /** Top-`k` centroid cells by cosine for a vector column, descending
    * `(cc, negCell)` structs — `slice(reverse(array_sort(<per-centroid
    * literal array>)), 1, k)` bit-for-bit, with the codebook shipped as
    * a [[CentroidKernel]] reference object instead of literal
    * expression nodes (constant plan size at any codebook size; see the
    * kernel scaladoc). A mixed-dimension codebook (malformed corpus —
    * the kernel's uniform-`dim` degenerate rule couldn't reproduce the
    * literal form's PER-centroid null) falls back to the literal
    * composed form, preserving its semantics exactly.
    */
  def centroidTopK(vec: Column, cents: Array[(Long, Seq[Float])], k: Int): Column = {
    require(cents.nonEmpty, "centroidTopK: empty codebook")
    val dims = cents.iterator.map(_._2.length).toSet
    if (dims.size != 1)
      org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.reverse(
          org.apache.spark.sql.functions.array_sort(literalCellScores(vec, cents))),
        1, k)
    else {
      val B = org.apache.spark.sql.graft.Bridge
      val kernel = new CentroidKernel(cents.map(_._1),
        flatFloats(cents, dims.head), dims.head, k)
      B.column(CentroidTopK(B.expression(vec), kernel))
    }
  }

  /** Best centroid cell for a vector column: `struct<cc, negCell>` —
    * `array_max(<per-centroid literal array>)` bit-for-bit (element 1
    * of the descending [[centroidTopK]]).
    */
  def centroidBest(vec: Column, cents: Array[(Long, Seq[Float])]): Column =
    org.apache.spark.sql.functions.element_at(centroidTopK(vec, cents, 1), 1)

  private def flatFloats(cents: Array[(Long, Seq[Float])], dim: Int): Array[Float] = {
    val out = new Array[Float](cents.length * dim)
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)._2
      var i = 0
      while (i < dim) { out(j * dim + i) = cv(i); i += 1 }
      j += 1
    }
    out
  }

  /** The pre-r16 literal per-centroid score array — kept ONLY as the
    * mixed-dimension fallback for [[centroidTopK]].
    */
  private def literalCellScores(vec: Column, cents: Array[(Long, Seq[Float])]): Column =
    org.apache.spark.sql.functions.array(cents.map { case (cid, cv) =>
      org.apache.spark.sql.functions.struct(
        cosineF(vec, org.apache.spark.sql.functions.typedLit(cv)).as("cc"),
        org.apache.spark.sql.functions.lit(-cid).as("negCell"))
    }.toIndexedSeq: _*)
}
