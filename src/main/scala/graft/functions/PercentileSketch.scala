package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import scala.collection.mutable

/** EXACT percentiles as a mergeable value-counts sketch — the scale path
  * for `percentiles` (reference `action.clj:2845-2929`, index formula
  * `idx = min(n-1, floor(n*q))` over metric-sorted values, Riemann's
  * `sorted-sample-extract`, `math.clj:109-131`).
  *
  * The naive plan (`collect_list` → `array_sort` → index) materializes
  * every window's full payload as ONE array value in ONE aggregation
  * buffer — at 100 TB a hot window is hundreds of millions of values and
  * that row simply doesn't fit. This [[TypedImperativeAggregate]] keeps a
  * value→count map instead: memory tracks the number of DISTINCT metric
  * values (monitoring metrics repeat heavily), updates are map-side
  * partial aggregation (each shuffle partition ships one small map, not
  * its rows), merges are count sums, and the final walk over the sorted
  * distinct values applies the exact index formula per quantile. Results
  * are bit-identical to the naive plan for any input — exact, not
  * approximate: `percentile_approx` ([[graft.operators.Windows.percentilesApprox]])
  * remains the constant-memory option when distinct cardinality is
  * unbounded too.
  *
  * Returns `array<double>` aligned with `quantiles`; all-null input
  * yields an array of nulls (matching the naive plan, where indexing an
  * empty sorted array gives a null metric per quantile).
  */
case class ExactPercentiles(
    child: Expression,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with UnaryLike[Expression] {

  // callers cast the child to double ([[graft.operators.Windows.percentiles]]);
  // a non-double child fails the eval cast loudly rather than silently
  require(quantiles.nonEmpty, "exact_percentiles needs at least one quantile")

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[Double, Long], input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      b.update(d, b.getOrElse(d, 0L) + 1L)
    }
    b
  }

  override def merge(b: mutable.HashMap[Double, Long], o: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    o.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    b
  }

  override def eval(b: mutable.HashMap[Double, Long]): Any = {
    val out = new Array[Any](quantiles.length)
    if (b.nonEmpty) {
      val entries = b.toArray.sortBy(_._1)
      val n = entries.iterator.map(_._2).sum
      var qi = 0
      while (qi < quantiles.length) {
        val idx = math.min(n - 1, math.floor(n * quantiles(qi)).toLong)
        var cum = 0L
        var ei = 0
        while (cum <= idx && ei < entries.length) {
          cum += entries(ei)._2
          ei += 1
        }
        out(qi) = entries(ei - 1)._1
        qi += 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(b: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    b.foreach { case (k, c) => bb.putDouble(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val b = new mutable.HashMap[Double, Long]()
    var i = 0
    while (i < size) {
      val k = bb.getDouble
      val c = bb.getLong
      b.update(k, c)
      i += 1
    }
    b
  }

  override protected def withNewChildInternal(newChild: Expression): ExactPercentiles =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ExactPercentiles =
    copy(inputAggBufferOffset = n)
}

object PercentileSketch {
  /** `exact_percentiles(col, quantiles)` as a Column aggregate. */
  def exactPercentiles(c: Column, quantiles: Seq[Double]): Column =
    Bridge.column(
      ExactPercentiles(Bridge.expression(c), quantiles).toAggregateExpression())
}
