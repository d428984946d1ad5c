package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Multi-dimensional data-clustering layout: Morton (Z-order) curves
  * (Morton 1966; the technique behind Delta Lake / Databricks `ZORDER BY`
  * and countless spatial stores).
  *
  * Why it matters at 100 TB: parquet readers prune files and row groups
  * by per-column min/max statistics. A table sorted on ONE column has
  * tight stats on that column and useless full-range stats on every
  * other — so a query selective in a second dimension scans everything.
  * Sorting by the INTERLEAVED bits of several columns tiles the space
  * into hypercubes: every file covers a small box in ALL participating
  * dimensions at once, and a predicate on any subset of them prunes most
  * files without touching a footer's data pages. The curve is computed
  * map-side (pure bit algebra, whole-stage codegen), the layout is one
  * range exchange — exactly the cost of an ordinary sorted write.
  *
  * Everything here is deterministic integer/IEEE arithmetic, so the
  * DuckDB oracle replays the key bit-for-bit.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column, the
    * first column occupying the least-significant lane. Inputs must be
    * non-negative and below 2^bits — higher bits are IGNORED (the value
    * wraps onto the grid); map continuous ranges with [[gridCoord]]
    * first. Pure Column algebra: `cols.size * bits` shift/mask terms,
    * well inside the codegen method limit for any sane (≤63-bit) key.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue: at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"zValue: ${cols.size} cols x $bits bits must fit a signed long (<= 63)")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Map a numeric column with known range [lo, hi] onto the 2^bits
    * cell grid [[zValue]] expects: `floor((x - lo) / w)` with cell width
    * `w = (hi - lo) / 2^bits`, clamped into [0, 2^bits). Subtraction,
    * division and floor are the same IEEE operations in every engine,
    * so grid assignment is cross-engine exact.
    */
  def gridCoord(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"gridCoord: empty range [$lo, $hi]")
    val cells = 1L << bits
    val w = (hi - lo) / cells
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((cells - 1).toDouble)).cast("long")
  }

  /** Write `df` clustered on the z-curve of `zcols`: one range exchange
    * on the z-value, each shard internally z-sorted, the helper column
    * dropped before write. Each output file then covers a tight min/max
    * box in EVERY `zcols` dimension — a selective predicate on any of
    * them prunes most files by footer stats alone. `shards` sizes the
    * files: pick `corpus_bytes / target_file_bytes` (512 MB – 1 GB files
    * at cluster scale).
    */
  def writeZOrdered(df: DataFrame, zcols: Seq[Column], path: String,
                    shards: Int, bits: Int = 16): Unit = {
    require(shards >= 1, s"writeZOrdered: shards must be >= 1, got $shards")
    df.withColumn("__z", zValue(zcols, bits))
      .repartitionByRange(shards, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert curve index of a 2-D grid cell (Hilbert 1891; the
    * data-clustering refinement Morton approximates — e.g. Databricks
    * liquid clustering replaced ZORDER with Hilbert for exactly the
    * property below). Unlike the z-curve, the Hilbert curve is
    * CONTINUOUS: consecutive indices are always grid-adjacent (no
    * quadrant-boundary jumps), so equal-size index ranges tile into
    * tighter boxes and footer-stats pruning touches fewer files on the
    * same slab queries.
    *
    * The classic per-bit fold (extract quadrant, accumulate `s²·((3·rx)
    * XOR ry)`, then flip+swap the LOWER bits into the rotated frame)
    * runs as the fused native [[HilbertIndex]] expression — map-side,
    * whole-stage codegen — and is exactly replayable as a chained-CTE
    * integer recurrence in any SQL engine ([[hilbertStepSql]] emits the
    * identical round for the oracle). Inputs wrap onto the grid like
    * [[zValue]].
    */
  def hilbertValue(xIn: Column, yIn: Column, bits: Int = 16): Column = {
    require(bits >= 1 && 2 * bits <= 62,
      s"hilbertValue: 2 x $bits bits must fit a signed long")
    val B = org.apache.spark.sql.graft.Bridge
    B.column(HilbertIndex(
      B.expression(xIn.cast("long")), B.expression(yIn.cast("long")), bits))
  }

  /** Scalar twin of [[hilbertValue]] — the loop both the interpreted and
    * codegen paths of [[HilbertIndex]] run.
    */
  def hilbertIndex(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = xIn & mask; var y = yIn & mask; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      val xl = x & (s - 1); val yl = y & (s - 1)
      if (ry == 0L) {
        if (rx == 1L) { x = (s - 1) - yl; y = (s - 1) - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
      s >>= 1
    }
    d
  }

  /** One round of the Hilbert fold as SQL over columns `(x, y, d)` —
    * the oracle's chained-CTE twin of the round [[hilbertValue]]
    * unrolls. Both sides are generated from the same step index, so
    * they cannot drift.
    */
  def hilbertStepSql(i: Int): String = {
    val s = 1L << i
    s"""CASE WHEN (y & $s) > 0 THEN x & ${s - 1}
       |     WHEN (x & $s) > 0 THEN ${s - 1} - (y & ${s - 1})
       |     ELSE y & ${s - 1} END AS x,
       |CASE WHEN (y & $s) > 0 THEN y & ${s - 1}
       |     WHEN (x & $s) > 0 THEN ${s - 1} - (x & ${s - 1})
       |     ELSE x & ${s - 1} END AS y,
       |d + $s * $s * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
       |                  (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d""".stripMargin
  }

  /** [[writeZOrdered]]'s Hilbert twin for two key columns. */
  def writeHilbertOrdered(df: DataFrame, xCol: Column, yCol: Column,
                          path: String, shards: Int, bits: Int = 16): Unit = {
    require(shards >= 1, s"writeHilbertOrdered: shards must be >= 1, got $shards")
    df.withColumn("__h", hilbertValue(xCol, yCol, bits))
      .repartitionByRange(shards, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert index as a fused native expression. The recurrence CANNOT
    * be unrolled as plain Column algebra: each round reads the previous
    * round's x AND y several times, so the expression tree (and the
    * generated code) grows ~4^bits — bits=8 already exhausts the heap
    * at planning time. A native expression runs the O(bits) loop at
    * execution instead, inside whole-stage codegen.
    */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any, b: Any): Any =
      hilbertIndex(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val xv = ctx.freshName("hx"); val yv = ctx.freshName("hy")
        val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
        val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
        val xl = ctx.freshName("hxl"); val yl = ctx.freshName("hyl")
        s"""
           |long $xv = $x & ${(1L << bits) - 1}L;
           |long $yv = $y & ${(1L << bits) - 1}L;
           |long $d = 0L;
           |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
           |  long $rx = (($xv & $s) > 0) ? 1L : 0L;
           |  long $ry = (($yv & $s) > 0) ? 1L : 0L;
           |  $d += $s * $s * ((3L * $rx) ^ $ry);
           |  long $xl = $xv & ($s - 1); long $yl = $yv & ($s - 1);
           |  if ($ry == 0L) {
           |    if ($rx == 1L) { $xv = ($s - 1) - $yl; $yv = ($s - 1) - $xl; }
           |    else { $xv = $yl; $yv = $xl; }
           |  } else { $xv = $xl; $yv = $yl; }
           |}
           |${ev.value} = $d;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** The files a min/max-pruning reader must touch for a conjunctive
    * box predicate — the layout's quality metric, measured from the data
    * itself (per-file column min/max == the stats a parquet footer
    * carries). Returns (files touched, total files). Test/audit face;
    * the production read path is simply `spark.read.parquet(path)
    * .filter(...)` where the same stats prune inside the scan.
    */
  def filesTouched(df: DataFrame, box: Map[String, (Long, Long)]): (Long, Long) = {
    val aggs = box.keys.toSeq.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val byFile = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    val hit = box.map { case (c, (lo, hi)) =>
      col(s"__mn_$c") <= lit(hi) && col(s"__mx_$c") >= lit(lo)
    }.reduce(_ && _)
    (byFile.filter(hit).count(), byFile.count())
  }
}
