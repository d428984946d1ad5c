package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — queries are broadcast, similarity
  * is a codegen'd higher-order fold per row, top-k is one shuffle on the
  * query id (`row_number` window). Scale path: sign-bucket (random
  * hyperplane flavored) LSH — each vector lands in a small bucket keyed
  * by the sign pattern of leading dimensions; probing joins only bucket
  * peers, trading recall for a corpus-size-independent candidate set.
  */
object Similarity {

  /** Cosine similarity as a deterministic left fold in index order (the
    * DuckDB oracle folds identically, so doubles match bit-for-bit).
    */
  def cosine(a: Column, b: Column): Column = {
    def fold(products: Column): Column =
      aggregate(products, lit(0.0), (acc, x) => acc + x)
    val dot = fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val na = fold(transform(a, x => x.cast("double") * x.cast("double")))
    val nb = fold(transform(b, x => x.cast("double") * x.cast("double")))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ties broken by id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", graft.functions.VectorExpressions.cosineF(col("query_vec"), col("nn_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("nn_id"), col("cosine"))
  }

  /** Sign-pattern bucket key over the first `bits` dimensions: the cheap,
    * deterministic stand-in for random-hyperplane LSH (dimensions of a
    * learned embedding are already mixed). Vectors in the same bucket are
    * near-duplicate candidates.
    */
  def signBucket(vec: Column, bits: Int = 16): Column =
    (1 to bits).map { i =>
      when(element_at(vec, i) >= 0, lit(1L << (i - 1))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN top-k — the classic cell-probe index as one
    * Spark plan:
    *
    *  1. *train*: centroids are the `nCells` lowest-id corpus vectors —
    *     deterministic stand-in for k-means (centroid training is
    *     pluggable; the index structure, not the training, is what this
    *     operator provides). Centroids are model-sized and collected once
    *     to the driver — the same data movement as any `broadcast()`; the
    *     corpus itself is never collected.
    *  2. *assign*: each corpus vector gets `nCells` codegen'd cosines
    *     against centroid literals and takes the arg-max cell via a
    *     struct-max — pure map-side projection, NO shuffle and no row
    *     amplification (a crossJoin+window argmax would shuffle
    *     corpus×nCells rows).
    *  3. *probe*: each query explodes its top-`nProbe` cells; candidates
    *     are fetched by a single equi-join on the cell id — the only
    *     shuffle of corpus data, and candidate count tracks cell sizes,
    *     not corpus size.
    *
    * Ties everywhere break toward the lower cell / id, matching the
    * DuckDB oracle.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              trainIters: Int = 0): DataFrame = {
    var cents: Array[(Long, Seq[Float])] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    // Optional Lloyd iterations — the distributed k-means step: assign
    // every vector to its nearest centroid (map-side argmax over centroid
    // literals, as below), then element-wise mean per cell via
    // posexplode + groupBy(cell, dim) — one shuffle of nCells×dim partial
    // sums per iteration, never the vectors themselves. Only the
    // model-sized (cell, mean) table is collected. Empty cells keep their
    // previous centroid.
    for (_ <- 1 to trainIters) {
      val assignScores: Column => Column = cellScoresOf(cents)(_)
      val means = corpus
        .select((-array_max(assignScores(col(vecCol)))("negCell")).as("cell"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s("m").cast("float")).as("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }

    def cellScores(vec: Column): Column = cellScoresOf(cents)(vec)

    val inverted = corpus.select(
      col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      (-array_max(cellScores(col(vecCol)))("negCell")).as("cell"))

    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
        explode(slice(reverse(array_sort(cellScores(col(vecCol)))), 1, nProbe)).as("p"))
      .select(col("query_id"), col("query_vec"), (-col("p.negCell")).as("cell"))

    val scored = inverted.join(probes, "cell")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.cosineF(col("query_vec"), col("nn_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("nn_id"), col("cosine"))
  }

  /** Multi-probe bucket set for a query vector: its own sign bucket plus
    * the buckets reached by flipping each of the `extraProbes`
    * least-confident bits — the dimensions with the smallest |value|,
    * i.e. the points closest to their separating hyperplane, exactly the
    * flips most likely to recover a near neighbor that landed one bucket
    * over (standard multi-probe LSH: Lv et al., VLDB'07).
    */
  def probeBuckets(vec: Column, bits: Int, extraProbes: Int): Column = {
    val base = signBucket(vec, bits)
    if (extraProbes <= 0) array(base)
    else {
      val confidence = array((1 to bits).map { i =>
        struct(abs(element_at(vec, i)).as("a"), lit(1L << (i - 1)).as("mask"))
      }: _*)
      val flips = transform(
        slice(array_sort(confidence), 1, extraProbes),
        s => base.bitwiseXOR(s("mask")))
      array_union(array(base), flips)
    }
  }

  /** Array of (cosine-to-centroid, -cell) structs for a vector column;
    * struct ordering gives "best cosine, ties to lowest cell" via
    * max / descending sort.
    */
  private def cellScoresOf(cents: Array[(Long, Seq[Float])])(vec: Column): Column =
    array(cents.map { case (cid, cv) =>
      struct(
        graft.functions.VectorExpressions.cosineF(vec, typedLit(cv)).as("cc"),
        lit(-cid).as("negCell"))
    }: _*)

  /** Bucketed ANN top-k: probe the query's sign bucket, plus
    * `extraProbes` least-confident-bit-flip buckets (multi-probe; 0 =
    * single-probe). One shuffle on the bucket key regardless of corpus
    * size; each extra probe adds one candidate bucket per query, not a
    * corpus scan. A corpus vector lives in exactly one bucket and probe
    * buckets are distinct, so no candidate pair is scored twice.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int = 16,
                   extraProbes: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      signBucket(col(vecCol), bits).as("__bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      explode(probeBuckets(col(vecCol), bits, extraProbes)).as("__bucket"))
    val scored = c.join(q, "__bucket")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", graft.functions.VectorExpressions.cosineF(col("query_vec"), col("nn_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("nn_id"), col("cosine"))
  }
}
