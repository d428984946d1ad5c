package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * [[TypedImperativeAggregate]] — the CONSTANT-memory scale path for
  * frequency estimation where the exact `groupBy(token).count` shuffle
  * key space is unbounded (web-corpus vocabularies, n-gram streams).
  *
  * The buffer is a fixed `depth × width` long matrix (d=4, w=8192 →
  * 256 KB) no matter how many distinct items flow through: updates are
  * map-side partial aggregation, merges are element-wise sums, and the
  * point estimate for an item is the MIN over its `depth` cells —
  * an overestimate by at most `2n/width` with probability
  * `1 − 2^−depth` (the classic CM bound). Exact `groupBy` counting
  * stays the right call when the key space fits; the sketch is what
  * still works when it does not.
  *
  * Hash discipline mirrors [[Text]]: row `j` buckets item `s` at
  * `md5Hash64("seed:j:" + s) mod width` — derivable by ANY engine with
  * md5, so the DuckDB oracle rebuilds the identical matrix cell-by-cell
  * (`cms_token_counts` gate). Production paths that don't need oracle
  * parity can swap in xxhash64 upstream; the matrix algebra is unchanged.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1, s"count_min: need depth/width >= 1, got $depth x $width")

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var j = 0
      while (j < depth) {
        b(j * width + CountMin.bucket(seed, j, s, width)) += 1L
        j += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(b.map(v => v: Any))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.length)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
}

object CountMin {

  /** JVM twin of [[Text.md5Hash64]]: first 15 md5 hex chars as a 60-bit
    * integer — bit-identical to the Column/DuckDB folds.
    *
    * Hot path: CountMinAgg.update calls this `depth` times per input row,
    * so the digest is thread-local (no per-call allocation) and the
    * 60-bit value is the big-endian first 8 digest bytes shifted right a
    * nibble — arithmetically identical to parsing the first 15 hex chars,
    * without building a hex string.
    */
  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Hash64(s: String): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Row-`j` bucket of item `s`: `md5Hash64("seed:j:" + s) mod width`
    * (60-bit hash is non-negative, so `%` == `pmod` on every engine).
    */
  def bucket(seed: String, j: Int, s: String, width: Int): Int =
    (md5Hash64(s"$seed:$j:$s") % width).toInt

  /** `count_min(col)` as a Column aggregate → flattened depth×width
    * `array<bigint>` matrix.
    */
  def countMin(c: Column, depth: Int, width: Int, seed: String): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(c), depth, width, seed).toAggregateExpression())

  /** Point-estimate Column: MIN over the `depth` cells of a COLLECTED
    * matrix (model-sized — ship it as a literal/broadcast, never a join).
    * Pure codegen'd algebra: one md5 per row per depth, `least` of
    * `element_at`s.
    */
  def estimate(item: Column, matrix: Array[Long], depth: Int, width: Int,
               seed: String): Column = {
    import org.apache.spark.sql.functions._
    require(matrix.length == depth * width,
      s"count_min estimate: matrix length ${matrix.length} != $depth x $width")
    val m = typedlit(matrix.toSeq)
    val cells = (0 until depth).map { j =>
      val b = pmod(Text.md5Hash64(concat(lit(s"$seed:$j:"), item)), lit(width.toLong))
      element_at(m, (lit(j.toLong * width) + b + 1L).cast("int"))
    }
    if (cells.length == 1) cells.head else least(cells: _*)
  }
}
