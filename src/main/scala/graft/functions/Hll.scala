package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
  * 2007) as a mergeable [[TypedImperativeAggregate]] — the third member
  * of the fixed-memory sketch family: count-min answers "how often is
  * x?", Misra-Gries answers "which x are frequent?", HLL answers "how
  * many distinct x?" — the vocabulary-size question an exact
  * `countDistinct` pays a full dedup exchange for.
  *
  * The buffer is `m = 2^b` one-byte registers no matter how many
  * distinct items flow through; update keeps the max first-one-bit rank
  * per register and merge is element-wise max — ASSOCIATIVE, COMMUTATIVE
  * and IDEMPOTENT, so the register table is exactly identical under any
  * partitioning or merge order (stronger than CMS/MG determinism: max
  * loses nothing, order never matters).
  *
  * Hash discipline mirrors [[CountMin]]: the 60-bit
  * `md5Hash64("seed:" + s)` splits into a `b`-bit register index (top
  * bits) and a `w = 60 - b` bit suffix whose leading-zero rank feeds the
  * register — all integer arithmetic an oracle engine replays exactly
  * (`hll_registers` gate). Standard error is `1.04 / sqrt(m)`.
  */
case class HllAgg(
    child: Expression,
    b: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(b >= 4 && b <= 20, s"hyperloglog: need 4 <= b <= 20 (m = 2^b registers), got $b")

  private val m = 1 << b
  private val w = 60 - b

  override def dataType: DataType = ArrayType(IntegerType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.md5Hash64(seed + ":" + v.toString)
      val idx = (h >>> w).toInt
      val rem = h & ((1L << w) - 1L)
      // rank = 1 + leading zeros of the w-bit suffix; all-zero suffix
      // ranks w + 1 (the spec's convention)
      val rank =
        if (rem == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rank > (buf(idx) & 0xFF)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((other(i) & 0xFF) > (buf(i) & 0xFF)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(r => (r & 0xFF): Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): HllAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAgg =
    copy(inputAggBufferOffset = n)
}

object Hll {

  /** `hyperloglog(col, b, seed)` as a Column aggregate → `array<int>` of
    * `2^b` register ranks.
    */
  def hll(c: Column, b: Int, seed: String): Column =
    Bridge.column(HllAgg(Bridge.expression(c), b, seed).toAggregateExpression())

  /** Bias-corrected cardinality estimate from a register array (the
    * FFGM07 formulas): harmonic-mean raw estimate with the linear-
    * counting small-range correction. Deterministic: the harmonic
    * denominator sums exact dyadic rationals in register order.
    */
  /** FFGM07 bias constant for `m` registers — the ONE definition both
    * the driver-math estimate and the streaming Column-algebra twin
    * read (they are spec-pinned to exact equality).
    */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Linear-counting cutoff multiplier (raw estimate <= LinearCutoff * m
    * with empty registers → switch to linear counting).
    */
  val LinearCutoff: Double = 2.5

  def estimate(registers: Array[Int], b: Int): Double = {
    val m = 1 << b
    require(registers.length == m, s"hll estimate: ${registers.length} registers != 2^$b")
    val alpha = Hll.alpha(m)
    var denom = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      denom += java.lang.Math.scalb(1.0, -registers(i)) // exact 2^-r
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / denom
    if (raw <= LinearCutoff * m && zeros > 0) m * StrictMath.log(m.toDouble / zeros)
    else raw
  }
}
