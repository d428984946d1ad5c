package graft

import graft.functions.{BottomK, BottomKAgg, Text}
import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV / bottom-k sketch laws: the kept set is exactly the k smallest
  * (hash, value) pairs under ANY partitioning (the oracle gates
  * `kmv_row_sample` / `kmv_quantiles` / `kmv_distinct` replay it in
  * DuckDB); quantile and distinct estimates obey their published error
  * bounds; serde round-trips; the SQL face equals the Column face.
  */
class BottomKSpec extends AnyFunSuite {
  import TestSpark.spark

  GraftExtensions.register(spark)

  private def rows(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, (i * 7919 % n).toDouble)).toDF("id", "v")
  }

  test("kept set == exact bottom-k, invariant under partitioning") {
    val df = rows(5000)
    def sample(parts: Int) =
      Sketches.kmvRowSample(df.repartition(parts), "id", "v", 64, "s")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val one = sample(1)
    val many = sample(13)
    assert(one == many)
    // exact reference: hash every id the same way, take the 64 smallest
    val want = df.select(
        Text.md5Hash64(concat_ws("|", lit("s"), col("id").cast("string"))).as("h"),
        col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sorted.take(64).toSeq
    assert(one == want)
    // ascending, no duplicates, exactly k
    assert(one.size == 64 && one == one.sorted && one.distinct == one)
  }

  test("below k the sketch keeps everything (sample == population)") {
    val df = rows(40)
    val got = Sketches.kmvRowSample(df, "id", "v", 256, "s").count()
    assert(got == 40L)
  }

  test("identical (hash, value) pairs collapse: duplicate ids don't skew") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (1L, 5.0), (2L, 7.0)).toDF("id", "v")
    assert(Sketches.kmvRowSample(df, "id", "v", 16, "s").count() == 2L)
  }

  test("quantile estimates land within the O(1/sqrt(k)) rank band") {
    // values are a permutation of 0..n-1, so true quantile q has value
    // ~ q*(n-1); with k=512 the rank error is ~1/sqrt(k) = 0.044 —
    // assert a generous 4-sigma band of 0.18
    val n = 20000
    val df = rows(n)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = Sketches.kmvQuantiles(df, "id", "v", 512, "s", qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    for (q <- qs) {
      val err = math.abs(got(q) / (n - 1).toDouble - q)
      assert(err < 0.18, s"quantile $q estimated ${got(q)} (rank err $err)")
    }
    // endpoint quantiles are the sample min/max, present and ordered
    val all = Sketches.kmvQuantiles(df, "id", "v", 512, "s", Seq(0.0, 1.0))
      .collect().map(_.getDouble(1))
    assert(all(0) <= all(1))
  }

  test("kmvDistinct: exact below k, within the relative-error band above") {
    val s = spark
    import s.implicits._
    val small = (0 until 100).map(i => (i.toLong, s"tok$i word$i")).toDF("doc_id", "text")
    val exact = Sketches.kmvDistinct(small, "text", 256, "kmv").head()
    assert(exact.getLong(0) == 200L && exact.getDouble(2) == 200.0)

    val big = (0 until 10000).map(i => (i.toLong, s"alpha$i beta$i")).toDF("doc_id", "text")
    val est = Sketches.kmvDistinct(big, "text", 256, "kmv").head().getDouble(2)
    // KMV relative error ~ 1/sqrt(k-2) = 6.3%; assert 3-sigma = 19%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.19, s"est $est for 20000 distinct")
  }

  test("buffer serde round-trips; merge is union-then-trim") {
    val agg = BottomKAgg(
      org.apache.spark.sql.graft.Bridge.expression(lit(0L)),
      org.apache.spark.sql.graft.Bridge.expression(lit(0.0)), 4)
    val b = agg.createAggregationBuffer()
    Seq((9L, 1.0), (3L, 2.0), (7L, 0.5), (1L, 9.9), (8L, 0.1)).foreach(b += _)
    while (b.size > 4) b -= b.last
    val back = agg.deserialize(agg.serialize(b))
    assert(back.toSeq == b.toSeq)
    val o = agg.createAggregationBuffer()
    Seq((2L, 4.0), (0L, 1.0)).foreach(o += _)
    val merged = agg.merge(b, o)
    assert(merged.toSeq == Seq((0L, 1.0), (1L, 9.9), (2L, 4.0), (3L, 2.0)))
  }

  test("bottom_k from SQL == the Column face") {
    val df = rows(1000)
    df.createOrReplaceTempView("bk_t")
    val viaSql = spark.sql(
      """SELECT bottom_k(conv(substring(md5(concat_ws('|', 's', cast(id as string))), 1, 15), 16, 10),
        |                v, 32) AS s
        |FROM bk_t""".stripMargin)
      .select(explode(col("s")).as("p"))
      .select(col("p.hash"), col("p.value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaCol = Sketches.kmvRowSample(df, "id", "v", 32, "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaCol)
  }

  test("kmv-sample / kmv-quantiles / kmv-distinct are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val df = rows(500).withColumnRenamed("v", "metric")
      .withColumn("text", concat(lit("w"), col("id")))
    def run(json: String) =
      Engine.run(Node.fromJson(json), df, EngineCtx(testMode = true)).taps("out")
    val sampled = run(
      """{"action":"kmv-sample","params":[{"id":"id","value":"metric","k":16}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    assert(sampled.count() == 16L)
    val quants = run(
      """{"action":"kmv-quantiles","params":[{"id":"id","value":"metric","k":64,"qs":[0.5]}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    assert(quants.columns.toSeq == Seq("q", "value") && quants.count() == 1L)
    val dist = run(
      """{"action":"kmv-distinct","params":[{"text":"text","k":64}],
        | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    assert(dist.columns.toSeq == Seq("k_kept", "h_k", "est") && dist.count() == 1L)
  }

  test("kmvOverlap: exact on small vocabularies, estimator within band above k, disjoint/identical extremes") {
    import graft.operators.Sketches
    val s = spark
    import s.implicits._
    def corpus(words: Seq[String]): org.apache.spark.sql.DataFrame =
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")

    // identical sides, both below k: exact path, jaccard 1, inter == union
    val a = corpus(Seq("alpha beta", "gamma"))
    val same = Sketches.kmvOverlap(a, a, "text", k = 16, "s").collect().head
    assert(same.getLong(0) == 3L && same.getDouble(2) == 3.0)
    assert(same.getDouble(4) == 1.0 && same.getDouble(5) == 3.0)

    // disjoint sides: jaccard and intersection exactly 0
    val b = corpus(Seq("delta epsilon", "zeta"))
    val disj = Sketches.kmvOverlap(a, b, "text", k = 16, "s").collect().head
    assert(disj.getLong(3) == 0L && disj.getDouble(4) == 0.0 && disj.getDouble(5) == 0.0)

    // above k: estimator arm; 400-word vocab, half shared. Union = 600,
    // jaccard = 200/600 — both within the O(1/sqrt(k)) band at k=64
    val shared = (0 until 200).map(i => s"shared$i")
    val bigA = corpus(shared ++ (0 until 200).map(i => s"lefty$i"))
    val bigB = corpus(shared ++ (0 until 200).map(i => s"right$i"))
    val est = Sketches.kmvOverlap(bigA, bigB, "text", k = 64, "s").collect().head
    assert(est.getLong(0) == 64L)
    assert(math.abs(est.getDouble(2) - 600.0) / 600.0 < 0.5, est.toString)
    assert(math.abs(est.getDouble(4) - 1.0 / 3.0) < 0.25, est.toString)

    // estimates are partition invariant (mergeable bottom-k underneath)
    val est2 = Sketches.kmvOverlap(bigA.repartition(7), bigB.repartition(5),
      "text", k = 64, "s").collect().head
    assert(est.toSeq == est2.toSeq)
  }

  test("kmv-overlap is a declarable IR action (artifact rule); validate artifact-total") {
    import graft.ir.{Engine, EngineCtx, Node}
    import graft.operators.Sketches
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmvo_ir").toString
    Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text")
      .write.parquet(s"$tmp/other")
    val out = Engine.run(Node.fromJson(
        s"""{"action":"kmv-overlap","params":[{"text":"text","other-path":"$tmp/other","k":16,"seed":"s"}],
           | "children":[{"action":"tap","params":["o"]}]}""".stripMargin),
      Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text"),
      EngineCtx(testMode = true)).taps("o").collect().head
    assert(out.getDouble(4) == 1.0)
    val v = Engine.validate(Node.fromJson(
        """{"action":"kmv-overlap","params":[{"text":"text","other-path":"/nope/x","k":16}],
          | "children":[{"action":"tap","params":["o"]}]}""".stripMargin),
      s, EngineCtx(testMode = true),
      Seq((1L, "t")).toDF("id", "text").schema)
    assert(v.isEmpty, v.mkString("; "))
  }
}
