package graft.operators

import graft.functions.PcaKernels
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA + whitening over an embedding column — the classic
  * pre-processing for dedup/retrieval embeddings (center, decorrelate,
  * equalize variance; whitening measurably improves cosine-based
  * retrieval on anisotropic sentence embeddings).
  *
  * Scale shape: ONE corpus pass through the mergeable
  * [[graft.functions.GramAgg]] (fixed `1 + d + d(d+1)/2` doubles per
  * partial, ~33 KB at d=64), a DRIVER-side Jacobi eigensolve of the d×d
  * covariance (model-sized, deterministic, microseconds at d=64), and a
  * map-side fused [[graft.functions.AffineProject]] kernel for the
  * projection — codegen'd, no UDF, no second shuffle. The model persists
  * like the k-means centroids or GD weights: train once, apply anywhere.
  *
  * Covariance is population (`/n`), eigenpairs sort by eigenvalue
  * descending (ties by index), and each component's sign is fixed so its
  * largest-|coefficient| entry is positive — bit-reproducible reruns.
  */
object Pca {

  final case class PcaModel(mean: Array[Double], eigVals: Array[Double],
                            components: Array[Array[Double]]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** One-pass moment stats: `(n, mean, covariance)` — covariance as a
    * full d×d symmetric matrix (built from the upper-triangle sums).
    */
  def gramStats(df: DataFrame, vecCol: String, d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val raw = df.agg(PcaKernels.gramAgg(col(vecCol), d).as("g"))
      .head.getSeq[Double](0).toArray
    val n = raw(0)
    require(n > 0, s"Pca: no valid rows of dim >= $d in '$vecCol'")
    val mean = Array.tabulate(d)(i => raw(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var g = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = raw(g) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        g += 1; j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }

  /** Upper-triangle covariance entries `(i, j, cov)` — the oracle-gated
    * face of [[gramStats]] (comparison at DECIMAL(38,9): partial-sum
    * order differs across engines by ~1e-13 relative, far below the
    * rounding).
    */
  def covarianceEntries(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val (_, _, cov) = gramStats(df, vecCol, d)
    val spark = df.sparkSession
    import spark.implicits._
    (for { i <- 0 until d; j <- i until d } yield (i, j, cov(i)(j)))
      .toDF("i", "j", "cov")
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * (fixed sweep order, fixed tolerance), exact enough at d ≤ a few
    * hundred. Returns (eigenvalues, eigenvectors as rows), sorted by
    * eigenvalue DESC with the sign convention above.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val tol = 1e-12
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { e =>
      val col = Array.tabulate(d)(i => v(i)(e))
      // sign convention: largest-|coeff| entry positive (first on ties)
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(col(i)) > math.abs(col(best))) best = i; i += 1 }
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Fit a k-component PCA model (one corpus pass + driver eigensolve). */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= d, s"Pca.fit: need 1 <= k <= d, got k=$k d=$d")
    val (_, mean, cov) = gramStats(df, vecCol, d)
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(mean, vals.take(k), vecs.take(k))
  }

  /** Project onto the top-k components: `out = V_k (x − μ)`. Map-side. */
  def project(df: DataFrame, vecCol: String, out: String, model: PcaModel): DataFrame =
    df.withColumn(out, PcaKernels.affineProject(col(vecCol),
      model.components.flatten, model.mean, model.k))

  /** PCA-whiten: `out = diag(1/sqrt(λ+eps)) V_k (x − μ)` — output dims
    * decorrelated with ~unit variance. Map-side, same fused kernel.
    */
  def whiten(df: DataFrame, vecCol: String, out: String, model: PcaModel,
             eps: Double = 1e-9): DataFrame = {
    val mat = model.components.zip(model.eigVals).flatMap {
      case (row, ev) =>
        val s = 1.0 / math.sqrt(math.max(ev, 0.0) + eps)
        row.map(_ * s)
    }
    df.withColumn(out, PcaKernels.affineProject(col(vecCol), mat, model.mean, model.k))
  }

  /** Persist / reload (the centroids/GD-weights artifact convention). */
  def saveModel(spark: SparkSession, model: PcaModel, path: String): Unit = {
    import spark.implicits._
    model.components.zipWithIndex.map { case (row, r) =>
      (r, model.eigVals(r), row.toSeq)
    }.toSeq.toDF("component", "eig_val", "row")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/components.parquet")
    Seq((model.mean.toSeq, model.d, model.k)).toDF("mean", "d", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta.parquet")
  }

  def loadModel(spark: SparkSession, path: String): PcaModel = {
    val meta = spark.read.parquet(s"$path/meta.parquet").head
    val mean = meta.getSeq[Double](0).toArray
    val rows = spark.read.parquet(s"$path/components.parquet")
      .orderBy("component").collect()
    PcaModel(mean, rows.map(_.getDouble(1)),
      rows.map(_.getSeq[Double](2).toArray))
  }
}
