package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface test: the session extensions expose the native kernels as
  * SQL functions, so `spark.sql` text reaches the same codegen'd
  * expressions as the Scala API.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  GraftExtensions.register(spark)

  test("cosine_similarity from SQL == the Column kernel") {
    val r = spark.sql(
      """SELECT cosine_similarity(
        |  array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float)),
        |  array(cast(3.0 as float), cast(2.0 as float), cast(1.0 as float))) AS c
        |""".stripMargin).collect().head.getDouble(0)
    val expected = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(r - expected) < 1e-12)
    // parity with the Scala API on real data
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    emb.createOrReplaceTempView("emb_ext")
    val sqlSum = spark.sql(
      """SELECT sum(cosine_similarity(a.embedding, b.embedding)) AS s
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id""".stripMargin)
      .collect().head.getDouble(0)
    val apiSum = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .agg(sum(graft.functions.VectorExpressions.cosineF(
        col("a.embedding"), col("b.embedding"))).as("s"))
      .collect().head.getDouble(0)
    assert(sqlSum == apiSum)
  }

  test("exact_percentiles from SQL == the operator's index formula") {
    val r = spark.sql(
      """SELECT exact_percentiles(v, array(0.0, 0.5, 1.0)) AS qs
        |FROM (VALUES (1.0), (2.0), (2.0), (9.0)) AS t(v)""".stripMargin)
      .collect().head.getSeq[Double](0)
    // n=4: idx(0.0)=0 -> 1.0, idx(0.5)=2 -> 2.0, idx(1.0)=min(3,4)=3 -> 9.0
    assert(r == Seq(1.0, 2.0, 9.0))
  }

  test("text functions from SQL == the Column API on the documents fixture") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_ext")
    val sql = spark.sql(
      """SELECT doc_id, text_quality(text) q, text_langid(text) l,
        |       text_tokens(text) t, text_fingerprint(text) f
        |FROM docs_ext ORDER BY doc_id""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
        graft.functions.Text.qualityScore(col("text")),
        graft.functions.Text.langId(col("text")),
        graft.functions.Text.tokenCount(col("text")),
        graft.functions.Text.fingerprint(col("text")))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("sketch aggregates from SQL == the Column/operator API") {
    val sql = spark.sql(
      """SELECT count_min(t, 2, 64, 'm') AS cm, misra_gries(t, 2) AS mg,
        |       hyperloglog(t, 8, 'hll') AS hl
        |FROM (VALUES ('a'), ('a'), ('a'), ('b'), ('c')) AS v(t)""".stripMargin)
      .collect().head
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val df = Seq("a", "a", "a", "b", "c").toDF("t")
    val api = df.agg(
      graft.functions.CountMin.countMin(col("t"), 2, 64, "m").as("cm"),
      graft.functions.MisraGries.misraGries(col("t"), 2).as("mg"),
      graft.functions.Hll.hll(col("t"), 8, "hll").as("hl")).collect().head
    assert(sql.getSeq[Long](0) == api.getSeq[Long](0))
    assert(sql.getSeq[org.apache.spark.sql.Row](1) == api.getSeq[org.apache.spark.sql.Row](1))
    assert(sql.getSeq[Int](2) == api.getSeq[Int](2))
    // 'a' (3 of 5 > n/(k+1)=1.67) must be tracked by the MG summary
    assert(sql.getSeq[org.apache.spark.sql.Row](1).exists(r => r.getString(0) == "a"))
  }

  test("non-literal quantiles are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT exact_percentiles(v, array(v)) FROM (VALUES (1.0)) AS t(v)""")
        .collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("literal"))
  }

  test("array_dot_long from SQL == the fused kernel") {
    val r = spark.sql(
      """SELECT array_dot_long(array(3L, -4L, 5L), array(2L, 10L, -1L)) AS d""")
      .collect().head.getLong(0)
    assert(r == 3L * 2 - 4 * 10 - 5)
  }

  test("text_normalize and signed_project from SQL == the Column/operator API") {
    import org.apache.spark.sql.functions._
    val n = spark.sql("""SELECT text_normalize('a\tb  C ') AS s""")
      .collect().head.getString(0)
    assert(n == "a b C")
    assert(spark.sql("""SELECT text_strip_html('<p>x &amp; y</p>') AS s""")
      .collect().head.getString(0) == "x & y")
    val u = spark.sql("""SELECT l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS u""")
      .collect().head.getSeq[Double](0)
    assert(u == Seq(0.6, 0.8))

    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    df.createOrReplaceTempView("emb_ext")
    val sql = spark.sql(
      "SELECT signed_project(embedding, 8, 4, 'rp') AS p FROM emb_ext")
      .collect().head.getSeq[Double](0)
    val api = graft.operators.Similarity.randomProject(df, "embedding", "p", 8, 4, "rp")
      .select("p").collect().head.getSeq[Double](0)
    assert(sql == api && sql.length == 4)

    val e = intercept[Exception] {
      spark.sql("SELECT signed_project(embedding, vec_id, 4, 'rp') FROM emb_ext").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
