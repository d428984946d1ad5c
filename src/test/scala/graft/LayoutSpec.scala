package graft

import graft.sources.Layout
import graft.ir.{Engine, EngineCtx, Node}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: curve arithmetic on hand-computed values, the
  * min/max-stats pruning win the interleaved layout exists for, grid
  * mapping edge cases, and the IR actions.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("layout_spec").toString

  private def rmrf(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("zValue interleaves bits: hand-computed values, monotone on the diagonal") {
    val s = spark
    import s.implicits._
    // x=5 (101), y=3 (011), 3 bits: lanes x->even positions, y->odd:
    // pos0=x0=1 pos1=y0=1 pos2=x1=0 pos3=y1=1 pos4=x2=1 pos5=y2=0 -> 11011b = 27
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((5L, 3L)) == 27L)
    assert(rows((0L, 0L)) == 0L)
    assert(rows((7L, 7L)) == 63L) // all six bits set
    assert(rows((1L, 0L)) == 1L && rows((0L, 1L)) == 2L) // lane order: first col = LSB
    // bits above the grid are ignored (value wraps onto the grid)
    val wrapped = Seq((8L + 5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3)).collect().head.getLong(0)
    assert(wrapped == 27L)
  }

  test("gridCoord maps a continuous range onto the cell grid, clamped") {
    val s = spark
    import s.implicits._
    val got = Seq(0.0, 0.49, 0.5, 0.99, 1.0, -5.0, 7.0).toDF("v")
      .select(col("v"), Layout.gridCoord(col("v"), 0.0, 1.0, 1).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.0) == 0L && got(0.49) == 0L)
    assert(got(0.5) == 1L && got(0.99) == 1L)
    assert(got(1.0) == 1L, "top of range clamps into the top cell")
    assert(got(-5.0) == 0L && got(7.0) == 1L, "out-of-range clamps, never wraps")
  }

  test("z-ordered layout prunes files on the SECOND dimension where x-sorted cannot") {
    val s = spark
    import s.implicits._
    // a full 64x64 grid; a query box selective in y only
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val box = Map("x" -> (0L, 63L), "y" -> (4L, 7L))

    val zDir = tmpDir()
    val xDir = tmpDir()
    try {
      Layout.writeZOrdered(grid, Seq(col("x"), col("y")), zDir, shards = 16, bits = 6)
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xDir)

      val (zHit, zTotal) = Layout.filesTouched(s.read.parquet(zDir), box)
      val (xHit, xTotal) = Layout.filesTouched(s.read.parquet(xDir), box)
      assert(zTotal == 16 && xTotal == 16)
      assert(xHit == 16, "x-sorted files all span the full y range: nothing prunes")
      assert(zHit * 2 <= zTotal,
        s"z-order must prune at least half the files for a 1/16-height slab, touched $zHit/$zTotal")

      // and the pruned read returns exactly the right rows
      val rows = s.read.parquet(zDir)
        .filter(col("y").between(4, 7)).count()
      assert(rows == 64 * 4)
    } finally { rmrf(zDir); rmrf(xDir) }
  }

  test("hilbertValue: hand values at order 1; bijective AND continuous at order 3") {
    val s = spark
    import s.implicits._
    // order 1: the U shape (0,0)->(0,1)->(1,1)->(1,0)
    val u = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), 1).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(u == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))

    // order 3 (8x8): indices are a permutation of 0..63, and the walk is
    // CONTINUOUS — consecutive indices are always grid-adjacent. That is
    // THE Hilbert property (the z-curve fails it at every quadrant seam)
    // and any bug in the rotate-fold breaks it somewhere on the grid.
    val cells = for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)
    val walk = cells.toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), 3).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(walk.map(_._1).toSeq == (0L until 64L).toSeq, "bijection onto 0..63")
    walk.sliding(2).foreach { case Array((_, (x1, y1)), (h2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"discontinuity before h=$h2: ($x1,$y1) -> ($x2,$y2)")
    }
    // wrap law shared with zValue: bits above the grid are ignored
    val wrapped = Seq((8L + 3L, 5L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 3)).collect().head.getLong(0)
    val base = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 3)).collect().head.getLong(0)
    assert(wrapped == base)
  }

  test("hilbert layout prunes slab queries at least as well as required of z-order") {
    val s = spark
    import s.implicits._
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val box = Map("x" -> (0L, 63L), "y" -> (4L, 7L))
    val hDir = tmpDir()
    try {
      Layout.writeHilbertOrdered(grid, col("x"), col("y"), hDir, shards = 16, bits = 6)
      val (hHit, hTotal) = Layout.filesTouched(s.read.parquet(hDir), box)
      assert(hTotal == 16)
      assert(hHit * 2 <= hTotal,
        s"hilbert must prune at least half the files for a 1/16-height slab, touched $hHit/$hTotal")
      val rows = s.read.parquet(hDir).filter(col("y").between(4, 7)).count()
      assert(rows == 64 * 4)
    } finally rmrf(hDir)
  }

  test("IR hilbert-key matches hilbertValue; output-hilbert validates and writes") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1L), (1L, 0L)).toDF("x", "y")
    val keyed = Engine.run(Node.fromJson(
      """{"action":"hilbert-key","params":[{"x":"x","y":"y","bits":1,"out":"h"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(keyed((0L, 1L)) == 1L && keyed((1L, 0L)) == 3L)

    val bad = Node.fromJson(
      """{"action":"output-hilbert","params":[{"x":"nope","y":"y","path":"/tmp/x","shards":2}],
        | "children":[]}""".stripMargin)
    assert(Engine.validate(bad, s, schema = df.schema).nonEmpty)
    val outDir = tmpDir()
    try {
      Engine.run(Node.fromJson(
        s"""{"action":"output-hilbert",
           | "params":[{"x":"x","y":"y","path":"$outDir/t","shards":1,"bits":1}],
           | "children":[]}""".stripMargin), df, EngineCtx(testMode = false))
      val back = s.read.parquet(s"$outDir/t").collect()
        .map(r => (r.getLong(r.fieldIndex("x")), r.getLong(r.fieldIndex("y")))).toSet
      assert(back == Set((0L, 1L), (1L, 0L)))
    } finally rmrf(outDir)
  }

  test("IR zorder-key matches Layout.zValue; output-zordered validates and writes") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, 3L), (2L, 6L)).toDF("x", "y")
    val keyed = Engine.run(Node.fromJson(
      """{"action":"zorder-key","params":[{"cols":["x","y"],"bits":3,"out":"z"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(keyed((5L, 3L)) == 27L)

    // validate arm: missing column fails loudly, well-formed passes
    val bad = Node.fromJson(
      """{"action":"output-zordered","params":[{"cols":["nope"],"path":"/tmp/x","shards":2}],
        | "children":[]}""".stripMargin)
    assert(Engine.validate(bad, s, schema = df.schema).nonEmpty)
    val good = Node.fromJson(
      """{"action":"output-zordered","params":[{"cols":["x","y"],"path":"/tmp/x","shards":2}],
        | "children":[]}""".stripMargin)
    assert(Engine.validate(good, s, schema = df.schema).isEmpty)

    val outDir = tmpDir()
    try {
      Engine.run(Node.fromJson(
        s"""{"action":"output-zordered",
           | "params":[{"cols":["x","y"],"path":"$outDir/t","shards":1,"bits":3}],
           | "children":[]}""".stripMargin), df, EngineCtx(testMode = false))
      val back = s.read.parquet(s"$outDir/t").collect()
        .map(r => (r.getLong(r.fieldIndex("x")), r.getLong(r.fieldIndex("y")))).toSet
      assert(back == Set((5L, 3L), (2L, 6L)), "helper z column dropped, data intact")
    } finally { rmrf(outDir) }
  }
}
