package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. 2007) as
  * a mergeable [[TypedImperativeAggregate]] — the fourth member of the
  * fixed-memory sketch family ([[CountMinAgg]] frequencies,
  * [[MisraGriesAgg]] heavy hitters, [[HllAgg]] distinct counts): the k
  * lexicographically smallest `(hash, value)` pairs of the stream.
  *
  * Because the kept set depends only on WHICH pairs flowed through —
  * never on order or partitioning — the sketch is exactly deterministic
  * and merge is set-union-then-trim: associative, commutative,
  * idempotent. Both classic KMV faces fall out:
  *
  *  - **uniform fixed-size sample**: hash a UNIQUE row id; the k
  *    smallest hashes are a uniform without-replacement sample of the
  *    rows, carrying `value` as the sampled payload — one corpus pass,
  *    map-side partial heaps, zero shuffle. Empirical quantiles of the
  *    sample estimate the data distribution with error O(1/sqrt(k)).
  *  - **distinct-count estimate**: hash the VALUE itself (payload 0);
  *    identical values collapse to one pair (the buffer is a set), and
  *    `est = (k-1) * 2^60 / h_k` with `h_k` the k-th smallest 60-bit
  *    hash — exact (`est = size`) below k distinct.
  *
  * Memory is exactly `k` (long, double) pairs per partial. Hashes are
  * [[Text.md5Hash64]] (first 15 md5 hex chars = 60 bits), so a DuckDB
  * oracle replays the identical kept set with `ORDER BY hash LIMIT k`.
  *
  * Identical `(hash, value)` duplicates collapse (set semantics) — for
  * the sampling face pass a unique id; duplicate ids are the caller's
  * bug, not a silent skew.
  *
  * Update is O(log k); merge O(k log k). Output:
  * `array<struct<hash, value>>` ascending, at most k entries.
  */
case class BottomKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[(Long, Double)]]
  with BinaryLike[Expression] {

  require(k >= 2, s"bottom_k: need k >= 2, got $k")

  private type Buf = scala.collection.mutable.TreeSet[(Long, Double)]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hash", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(b: Buf, input: InternalRow): Buf = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) {
      val pair = (h.asInstanceOf[Long], v.asInstanceOf[Double])
      if (b.size < k) b += pair
      else if (Ordering[(Long, Double)].lt(pair, b.last)) {
        b += pair
        if (b.size > k) b -= b.last
      }
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    b ++= o
    while (b.size > k) b -= b.last
    b
  }

  override def eval(b: Buf): Any = {
    val rows: Array[Any] = b.toArray.map { case (h, v) => InternalRow(h, v): Any }
    new GenericArrayData(rows) // TreeSet iterates ascending already
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf()
    var i = 0
    while (i < n) { b += ((in.readLong(), in.readDouble())); i += 1 }
    b
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKAgg =
    copy(left = newLeft, right = newRight)
  override def withNewMutableAggBufferOffset(n: Int): BottomKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKAgg =
    copy(inputAggBufferOffset = n)
}

object BottomK {

  /** `bottom_k(hashCol, valueCol, k)` as a Column aggregate →
    * `array<struct<hash, value>>` (at most `k` entries, hash ASC).
    * `hashCol` is normally [[Text.md5Hash64]] of a unique id (sampling
    * face) or of the value itself (distinct face, value 0).
    */
  def bottomK(hash: Column, value: Column, k: Int): Column =
    Bridge.column(
      BottomKAgg(Bridge.expression(hash), Bridge.expression(value), k)
        .toAggregateExpression())
}
