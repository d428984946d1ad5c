package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982) as a mergeable
  * [[TypedImperativeAggregate]] — the FIXED-memory top-k companion to
  * [[CountMinAgg]]. Where count-min answers "how often is item x?" for a
  * caller-supplied x, Misra-Gries answers "WHICH items are frequent?"
  * without ever materializing the distinct key space: the buffer is at
  * most `k` (item, counter) pairs no matter how many distinct items flow
  * through, so the heavy-hitter question costs zero vocabulary shuffle.
  *
  * Guarantees (the classic ones, preserved under merge by the
  * Agarwal et al. 2013 "Mergeable Summaries" merge rule):
  *
  *  - underestimate-only: `est(x) <= true(x)` for every tracked item;
  *  - bounded error: `true(x) - est(x) <= n / (k + 1)` where `n` is the
  *    TOTAL stream length (summed over all merged partials);
  *  - completeness: every item with `true(x) > n / (k + 1)` is present
  *    in the final summary, regardless of partitioning or input order.
  *
  * The SUMMARY itself is order-dependent at the margin (which sub-
  * threshold items happen to survive varies with partitioning) — exact
  * answers come from the standard two-pass pattern in
  * [[graft.operators.Sketches.heavyHitters]]: candidates from this
  * sketch, then an exact recount of the (<= k) candidates only. That
  * composed output IS deterministic, which is what the oracle gate pins.
  *
  * Update is O(1) amortized (the decrement-all step charges each stored
  * count at most once); merge is counter addition followed by the
  * (k+1)-th-largest subtraction. Output: `array<struct<item, est>>`
  * ordered by (est DESC, item ASC).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: need k >= 1 counters, got $k")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur = b.getOrElse(s, -1L)
      if (cur >= 0L) b(s) = cur + 1L
      else if (b.size < k) b(s) = 1L
      else {
        // no free counter: decrement all, evict zeros (the MG step that
        // buys the n/(k+1) bound — each decrement "spends" k+1 stream
        // items: this one plus one unit from each of the k counters)
        val dead = List.newBuilder[String]
        b.mapValuesInPlace { (key, c) =>
          if (c == 1L) { dead += key; 0L } else c - 1L
        }
        dead.result().foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    o.foreach { case (s, c) => b(s) = b.getOrElse(s, 0L) + c }
    if (b.size > k) {
      // subtract the (k+1)-th largest counter from all, keep positives —
      // the mergeable-summaries rule that preserves the global bound
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = List.newBuilder[String]
      b.mapValuesInPlace { (key, c) =>
        val nc = c - cut
        if (nc <= 0L) { dead += key; 0L } else nc
      }
      dead.result().foreach(b.remove)
    }
    b
  }

  override def eval(b: Buf): Any = {
    val rows: Array[Any] = b.toArray.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (s, c) =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len)
      in.readFully(sb)
      b(new String(sb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    b
  }

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
}

object MisraGries {

  /** `misra_gries(col, k)` as a Column aggregate →
    * `array<struct<item, est>>` (at most `k` entries, est DESC).
    */
  def misraGries(c: Column, k: Int): Column =
    Bridge.column(
      MisraGriesAgg(Bridge.expression(c), k).toAggregateExpression())
}
