package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
