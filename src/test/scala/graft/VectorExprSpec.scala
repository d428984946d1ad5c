package graft

import graft.functions.VectorExpressions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `CosineSimilarity` expression must be bit-identical to the
  * composed-builtin fold ([[Similarity.cosine]]) — the DuckDB oracle folds
  * the same way, so any drift here would silently break the hash gate.
  */
class VectorExprSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float], Seq[Float])]) =
    rows.toDF("id", "a", "b")

  test("native cosine == composed-builtin cosine, bit for bit") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 200L).map { i =>
      val d = 64
      (i, Seq.fill(d)(rng.nextFloat() * 2 - 1), Seq.fill(d)(rng.nextFloat() * 2 - 1))
    }
    val df = vecs(rows)
      .withColumn("native", VectorExpressions.cosineF(col("a"), col("b")))
      .withColumn("hof", Similarity.cosine(col("a"), col("b")))
    val diff = df.filter(
      col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0)
    // bit-identity, not approximate equality
    val pairs = df.select("native", "hof").collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array and null element both yield null") {
    val df = Seq(
      (1L, Seq(1f, 2f), null.asInstanceOf[Seq[Float]]),
      (2L, Seq(1f, 2f), Seq(3f, 4f))
    ).toDF("id", "a", "b")
      .withColumn("c", VectorExpressions.cosineF(col("a"), col("b")))
    val got = df.orderBy("id").select("c").collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
      .withColumn("c", VectorExpressions.cosineF(col("a"), col("b")))
    assert(withNullElem.select("c").collect().head.isNullAt(0))
  }

  test("ragged inputs yield null, matching the composed zip_with form") {
    // a silent prefix cosine on mixed-dimension embeddings would be a
    // plausible-but-wrong similarity feeding dedup/ANN decisions — the
    // native kernel must null out exactly like zip_with's null padding
    val df = Seq(
      (1L, Seq(1f, 2f, 3f), Seq(1f, 2f)),      // ragged → null
      (2L, Seq(1f, 2f), Seq(1f, 2f, 3f)),      // ragged the other way → null
      (3L, Seq(1f, 2f), Seq(3f, 4f))           // equal length → value
    ).toDF("id", "a", "b")
      .withColumn("native", VectorExpressions.cosineF(col("a"), col("b")))
      .withColumn("hof", Similarity.cosine(col("a"), col("b")))
    val got = df.orderBy("id").select("native", "hof").collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(!got(2).isNullAt(0) &&
      java.lang.Double.doubleToLongBits(got(2).getDouble(0)) ==
        java.lang.Double.doubleToLongBits(got(2).getDouble(1)))
    // interpreted eval path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val mk = (s: Seq[Float]) => Literal.create(ArrayData.toArrayData(s.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    assert(graft.functions.CosineSimilarity(mk(Seq(1f, 2f, 3f)), mk(Seq(1f, 2f))).eval(null) == null)
  }

  test("interpreted eval path matches codegen path") {
    val df = vecs(Seq((1L, Seq(0.5f, -0.25f, 3f), Seq(1f, 2f, -0.5f))))
    val viaCodegen = df.select(VectorExpressions.cosineF(col("a"), col("b"))).collect().head.getDouble(0)
    val viaEval = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.ArrayData
      val mk = (s: Seq[Float]) => Literal.create(ArrayData.toArrayData(s.toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
      graft.functions.CosineSimilarity(mk(Seq(0.5f, -0.25f, 3f)), mk(Seq(1f, 2f, -0.5f)))
        .eval(null).asInstanceOf[Double]
    }
    assert(java.lang.Double.doubleToLongBits(viaCodegen) == java.lang.Double.doubleToLongBits(viaEval))
  }

  test("ArrayDotLong == composed zip_with/aggregate fold; null poisoning") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      (i, Seq.fill(64)((rng.nextInt(255) - 127).toLong),
        Seq.fill(64)((rng.nextInt(255) - 127).toLong))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native", VectorExpressions.dotL(col("a"), col("b")))
      .withColumn("hof", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    val n = Seq((1L, Seq(1L, 2L), null.asInstanceOf[Seq[Long]])).toDF("id", "a", "b")
      .select(VectorExpressions.dotL(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
    // interpreted eval agrees with the codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val mk = (s: Seq[Long]) => Literal.create(ArrayData.toArrayData(s.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val ev = graft.functions.ArrayDotLong(mk(Seq(3L, -4L, 5L)), mk(Seq(2L, 10L, -1L)))
      .eval(null).asInstanceOf[Long]
    assert(ev == 3L * 2 - 4 * 10 - 5)
  }

  test("SignedProject == composed index-order fold, bit for bit; short/null inputs -> null") {
    val rng = new scala.util.Random(23)
    val (dIn, dOut) = (16, 4)
    val signs = Similarity.projectionSigns(dOut, dIn, "spec")
    val rows = (1L to 100L).map(i => (i, Seq.fill(dIn)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
      .withColumn("native", VectorExpressions.signedProject(col("v"), signs))
    // composed reference: per out-dim fold from 0.0 in index order
    val composed = signs.map { row =>
      row.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (s, i)) =>
        val x = element_at(col("v"), i + 1).cast("double")
        acc + (if (s > 0) x else -x)
      } / lit(math.sqrt(dOut.toDouble))
    }
    val diff = df.withColumn("ref", array(composed.toIndexedSeq: _*))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0)
    // signs are ±1 and deterministic for a seed
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(Similarity.projectionSigns(dOut, dIn, "spec").flatten.toSeq == signs.flatten.toSeq)
    assert(Similarity.projectionSigns(dOut, dIn, "other").flatten.toSeq != signs.flatten.toSeq)
    // input shorter than dIn → null
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
      .select(VectorExpressions.signedProject(col("v"), signs)).collect()
    assert(short.head.isNullAt(0))
  }

  // the literal per-centroid score array CentroidTopK replaces — the
  // bit-compat reference for the kernel tests below
  private def literalScores(vec: org.apache.spark.sql.Column,
                            cents: Array[(Long, Seq[Float])]) =
    array(cents.map { case (cid, cv) =>
      struct(VectorExpressions.cosineF(vec, typedLit(cv)).as("cc"),
        lit(-cid).as("negCell"))
    }.toIndexedSeq: _*)

  test("CentroidTopK == slice(reverse(array_sort(<literal array>))), bit for bit") {
    val rng = new scala.util.Random(31)
    val dim = 24
    val cents: Array[(Long, Seq[Float])] =
      Array.tabulate(37)(j => (j.toLong * 3 + 1, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val rows = (1L to 150L).map(i => (i, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    for (k <- Seq(1, 4, 37, 50)) {
      val got = df.select(col("id"),
          VectorExpressions.centroidTopK(col("v"), cents, k).as("kern"),
          slice(reverse(array_sort(literalScores(col("v"), cents))), 1, k).as("ref"))
        .collect()
      got.foreach { r =>
        val a = r.getSeq[org.apache.spark.sql.Row](1)
        val b = r.getSeq[org.apache.spark.sql.Row](2)
        assert(a.size == b.size, s"k=$k id=${r.getLong(0)}")
        a.zip(b).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(y.getDouble(0)))
          assert(x.getLong(1) == y.getLong(1))
        }
      }
    }
    // best face == array_max of the literal array
    val best = df.select(
        VectorExpressions.centroidBest(col("v"), cents).as("kern"),
        array_max(literalScores(col("v"), cents)).as("ref"))
      .collect()
    best.foreach { r =>
      val (x, y) = (r.getStruct(0), r.getStruct(1))
      assert(java.lang.Double.doubleToLongBits(x.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(y.getDouble(0)))
      assert(x.getLong(1) == y.getLong(1))
    }
  }

  test("CentroidTopK ties break to the lower cell; degenerate vectors degrade like the literal form") {
    val v = Seq.fill(8)(0.5f)
    // two identical centroids under different cells: cosine ties exactly,
    // negCell (desc) must pick the LOWER cell first — and the duplicate
    // centroid must still appear second in a k=2 probe list
    val cents: Array[(Long, Seq[Float])] =
      Array((7L, v), (3L, v), (11L, Seq.fill(8)(-0.5f)))
    val df = Seq((1L, v)).toDF("id", "v")
    val got = df.select(VectorExpressions.centroidTopK(col("v"), cents, 3).as("t"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(got.map(_.getLong(1)) == Seq(-3L, -7L, -11L))
    // null vector / null element / wrong length: all-null cc, cells
    // ascending — exactly the literal form's per-centroid null cosines
    val weird = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST(NULL AS ARRAY<FLOAT>)),
        |  (2L, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT),
        |             CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT),
        |             CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))),
        |  (3L, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS t(id, v)""".stripMargin)
    val wr = weird.select(col("id"),
        VectorExpressions.centroidTopK(col("v"), cents, 2).as("kern"),
        slice(reverse(array_sort(literalScores(col("v"), cents))), 1, 2).as("ref"))
      .orderBy("id").collect()
    wr.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](1)
      val b = r.getSeq[org.apache.spark.sql.Row](2)
      assert(a.map(_.getLong(1)) == Seq(-3L, -7L), s"id=${r.getLong(0)}")
      a.zip(b).foreach { case (x, y) =>
        assert(x.isNullAt(0) && y.isNullAt(0), s"id=${r.getLong(0)}")
        assert(x.getLong(1) == y.getLong(1))
      }
    }
  }

  test("CentroidTopK interpreted eval matches codegen path") {
    val rng = new scala.util.Random(41)
    val dim = 8
    val cents: Array[(Long, Seq[Float])] =
      Array.tabulate(5)(j => (j.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val vec = Seq.fill(dim)(rng.nextFloat() * 2 - 1)
    val viaCodegen = Seq((1L, vec)).toDF("id", "v")
      .select(VectorExpressions.centroidTopK(col("v"), cents, 3))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val kernel = new graft.functions.CentroidKernel(cents.map(_._1),
      cents.flatMap(_._2), dim, 3)
    val viaEval = graft.functions.CentroidTopK(
        Literal.create(ArrayData.toArrayData(vec.toArray),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        kernel)
      .eval(null).asInstanceOf[ArrayData]
    assert(viaEval.numElements() == viaCodegen.size)
    (0 until viaEval.numElements()).foreach { i =>
      val row = viaEval.getStruct(i, 2)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(viaCodegen(i).getDouble(0)))
      assert(row.getLong(1) == viaCodegen(i).getLong(1))
    }
  }

  test("randomProject preserves pairwise squared distances in expectation (JL lemma)") {
    // the ±1/sqrt(d') construction satisfies E[||P(x-y)||²] = ||x-y||²
    // with per-pair relative std ~ sqrt(2/d') ≈ 0.35 at d'=16 — so the
    // MEAN ratio over many pairs is tight while single pairs wobble
    val rng = new scala.util.Random(5)
    val rows = (1L to 60L).map(i => (i, Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val proj = Similarity.randomProject(df, "v", "p", 64, 16, "jl")
      .select("id", "v", "p").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getSeq[Double](2))).sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- proj.indices; j <- i + 1 until proj.length if rng.nextDouble() < 0.1)
      yield d2(proj(i)._3, proj(j)._3) / d2(proj(i)._2.map(_.toDouble), proj(j)._2.map(_.toDouble))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean over ${ratios.size} pairs")
    // individual pairs stay within the lemma's coarse band
    assert(ratios.count(r => r > 0.3 && r < 2.0) >= ratios.size * 9 / 10,
      s"too many outlier pairs: ${ratios.count(r => r <= 0.3 || r >= 2.0)} of ${ratios.size}")
  }
}
