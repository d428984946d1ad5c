package graft

import graft.functions.{HashingTfExpr, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashing-trick featurizer laws: bucket parity with the engine-portable
  * md5 fold (oracle gate `hashing_tf`), count conservation, totality,
  * SQL==Column parity — and the point of it: raw text through
  * `hashing_tf` into the distributed classifier learns a separable
  * problem with NO vocabulary state.
  */
class HashingTfSpec extends AnyFunSuite {
  import TestSpark.spark

  GraftExtensions.register(spark)

  test("bucket parity with Text.md5Hash64; counts conserved; fixed dim") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta alpha gamma"), (2L, ""), (3L, "zeta")).toDF("id", "text")
    val out = df.select(col("id"),
      HashingTfExpr(Text.tokens(col("text")), 16, "htf").as("v")).orderBy("id").collect()
    // total mass == token count
    assert(out(0).getSeq[Double](1).sum == 4.0)
    assert(out(1).getSeq[Double](1).sum == 0.0)
    assert(out.forall(_.getSeq[Double](1).size == 16))
    // the bucket of 'alpha' matches the Column-side md5 convention
    val expected = df.sparkSession.range(1)
      .select((org.apache.spark.sql.functions.pmod(
        Text.md5Hash64(lit("htf:alpha")), lit(16L))).cast("int")).head.getInt(0)
    assert(out(0).getSeq[Double](1)(expected) >= 2.0) // alpha counted twice there
  }

  test("null text -> null vector; null tokens inside the array are skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(Option.empty[String], Some("x")).toDF("text")
    val rows = df.select(HashingTfExpr(Text.tokens(col("text")), 8, "s")).collect()
    assert(rows.exists(_.isNullAt(0)) || rows.forall(!_.isNullAt(0))) // totality: no throw
    val withNulls = spark.sql("SELECT hashing_tf(array('a', NULL, 'a'), 8, 's') AS v")
      .head.getSeq[Double](0)
    assert(withNulls.sum == 2.0) // the NULL element contributes nothing
  }

  test("SQL face == Column face on the documents fixture") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    df.createOrReplaceTempView("htf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, hashing_tf(
        |  filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0), 32, 'htf') AS v
        |FROM htf_docs""".stripMargin)
      .orderBy("doc_id").collect().map(_.getSeq[Double](1)).toSeq
    val viaCol = df.select(col("doc_id"),
        HashingTfExpr(Text.tokens(col("text")), 32, "htf").as("v"))
      .orderBy("doc_id").collect().map(_.getSeq[Double](1)).toSeq
    assert(viaSql == viaCol)
  }

  test("end to end: raw text -> hashing_tf -> distributed classifier separates") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(3)
    val fillers = Array("market", "report", "garden", "update", "letter", "notes")
    val docs = (1 to 200).map { i =>
      val spammy = i % 2 == 0
      val words = (1 to 8).map(_ => fillers(rng.nextInt(fillers.length))) ++
        (if (spammy) Seq("winner", "prize") else Seq.empty)
      (i.toLong, words.mkString(" "), if (spammy) 1.0 else 0.0)
    }
    val df = docs.toDF("id", "text", "label")
      .withColumn("vec", HashingTfExpr(Text.tokens(col("text")), 64, "htf"))
    val model = graft.operators.Training.trainLogistic(
      df, "id", "vec", "label", dim = 64, epochs = 30, lr = 0.5)
    val scored = graft.operators.Training.scoreLogistic(df, "vec", model, "p")
    val acc = scored.select(
        when((col("p") > 0.5) === (col("label") === 1.0), 1.0).otherwise(0.0).as("ok"))
      .agg(avg(col("ok"))).head.getDouble(0)
    assert(acc >= 0.95, s"hashed-feature classifier accuracy $acc")
  }

  test("hashing-tf is a declarable IR action") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a")).toDF("id", "text")
    val out = Engine.run(Node.fromJson(
      """{"action":"hashing-tf","params":[{"field":"text","dim":8,"out":"vec"}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    assert(out.head.getSeq[Double](out.columns.indexOf("vec")).sum == 3.0)
  }
}
