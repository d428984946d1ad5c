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
}
