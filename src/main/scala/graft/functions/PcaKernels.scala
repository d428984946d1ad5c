package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Mergeable first+second-moment accumulator over an `array<float>`
  * vector column — the single-pass input to covariance/PCA. Buffer is
  * `1 + d + d(d+1)/2` doubles (count, per-dim sums, upper-triangle
  * row-major sum of products): FIXED size regardless of row count, so
  * partials combine map-side and each shuffle partition ships one ~33 KB
  * blob at d=64 — the same scale shape as the k-means partial sums or
  * the GD gradient. Rows shorter than `d` or containing nulls are
  * skipped (counted rows are exactly the valid ones).
  *
  * Output: flattened `array<double>` `[n, s_0..s_{d-1}, g_00, g_01, ...]`
  * (g upper-triangle row-major). Downstream turns it into
  * `cov(i,j) = g_ij/n − (s_i/n)(s_j/n)` — population covariance.
  */
case class GramAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  require(d >= 1, s"gram_agg: need d >= 1, got $d")
  private val gramLen = d * (d + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + d + gramLen)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      if (x.numElements() >= d) {
        val row = new Array[Double](d)
        var i = 0
        while (i < d) {
          if (x.isNullAt(i)) return b
          row(i) = x.getFloat(i).toDouble
          i += 1
        }
        b(0) += 1.0
        i = 0
        var g = 1 + d
        while (i < d) {
          b(1 + i) += row(i)
          var j = i
          while (j < d) {
            b(g) += row(i) * row(j)
            g += 1
            j += 1
          }
          i += 1
        }
      }
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    new GenericArrayData(b.map(v => v: Any))

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.length)
    b.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): GramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramAgg =
    copy(inputAggBufferOffset = n)
}

/** Fused affine projection kernel `y = M (x − μ)`: `array<float>` of at
  * least `d` elements → `array<double>` of `k`, with the k×d row-major
  * matrix and the d-vector mean shipped once per task as reference
  * objects (NOT literal expression nodes — the composed column-algebra
  * form unrolls k×d terms and overflows the 64 KB Janino method limit,
  * the [[SignedProject]] pitfall). Fold semantics per output dim: index
  * order, double precision, from 0.0. Null array, null element within
  * the first `d`, or a shorter input → null.
  */
case class AffineProject(child: Expression, mat: Array[Double],
                         mean: Array[Double], k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val d = mean.length
  require(k >= 1 && mat.length == k * d,
    s"AffineProject: matrix length ${mat.length} != $k x $d")

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < d) return null
    val cx = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) return null
      cx(i) = x.getFloat(i).toDouble - mean(i)
      i += 1
    }
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      i = 0
      while (i < d) { acc += mat(r * d + i) * cx(i); i += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[]")
    val meanRef = ctx.addReferenceObj("mean", mean, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      val cx = ctx.freshName("cx")
      val out = ctx.freshName("out")
      s"""
         |if ($x.numElements() < $d) { ${ev.isNull} = true; } else {
         |  double[] $cx = new double[$d];
         |  for (int $i = 0; !${ev.isNull} && $i < $d; $i++) {
         |    if ($x.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $cx[$i] = (double) $x.getFloat($i) - $meanRef[$i]; }
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[$k];
         |    for (int $r = 0; $r < $k; $r++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $d; $i++) {
         |        $acc += $matRef[$r * $d + $i] * $cx[$i];
         |      }
         |      $out[$r] = $acc;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PcaKernels {
  /** `gram_agg(col, d)` as a Column aggregate. */
  def gramAgg(c: Column, d: Int): Column =
    Bridge.column(GramAgg(Bridge.expression(c), d).toAggregateExpression())

  /** `affine_project(col)` with model-sized constants. */
  def affineProject(c: Column, mat: Array[Double], mean: Array[Double], k: Int): Column =
    Bridge.column(AffineProject(Bridge.expression(c), mat, mean, k))
}
