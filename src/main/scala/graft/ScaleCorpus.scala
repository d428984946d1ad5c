package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-shifted ×N corpus builder — the HONEST scale-probe input.
  *
  * `tools/scale_probe.sh`'s naive file duplication is the right probe
  * for scan / aggregate / window / key-aggregated-join shapes, but it
  * puts every JOIN KEY on both sides of every join N times: a
  * customer⋈orders join over a ×100-duplicated dir emits 100× the
  * matches PER ROW, i.e. N² output for N× input — measured 72× wall
  * for 10× data on `tpch_q3` where every other probe row is ≤6×
  * (SCALING.md round-12 ×100 table). That is an artifact of the
  * duplication, not of the plan: real corpora grow with NEW keys.
  *
  * This main replicates each table N times with every integer id
  * column shifted by `replica × stride` (one global stride = max over
  * all key columns + 1), so foreign-key families stay consistent —
  * replica i's lineitem rows reference replica i's orders/customers —
  * and joins scale the way a real ×N corpus does. Dimension tables
  * (`region`, `nation`) are copied once and their keys never shift, so
  * every replica shares them (exactly how a bigger TPC-H keeps its 25
  * nations). With `perturbText`, each document replica appends a
  * replica token to `text`, so text operators see N× DISTINCT
  * documents (near-dup structure per replica preserved, no ×N
  * exact-clone explosion in dedup probes).
  *
  * Usage: ScaleCorpus <srcDir> <outDir> <copies> [perturbText]
  * (dev harness, same family as [[Bench]]/[[Verify]]; not part of the
  * library surface)
  */
object ScaleCorpus {

  /** Integer id columns per table, grouped so FK families shift together. */
  val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"))

  /** Shared dimensions: one copy, keys unshifted (all replicas join them). */
  val CopyOnce: Seq[String] = Seq("region", "nation")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleCorpus <srcDir> <outDir> <copies> [perturbText]")
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val perturbText = args.length > 3 && args(3).toBoolean
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // only scale the tables actually present in srcDir (partial corpora
    // are a legitimate probe input)
    val present = KeyCols.filter { case (t, _) =>
      new java.io.File(s"$src/$t.parquet").exists() }
    require(present.nonEmpty, s"no KeyCols table found under $src")

    // one global stride covers every family; ids stay disjoint per
    // replica. Empty tables contribute no key (max over an empty table
    // is null, not 0 — getLong would NPE).
    val maxKeys = present.toSeq.flatMap { case (t, cols) =>
      val df = table(t)
      cols.flatMap(c => Option(df.agg(max(col(c).cast("long"))).head
        .getAs[java.lang.Long](0)).map(_.longValue))
    }
    require(maxKeys.nonEmpty, "every present KeyCols table is empty")
    val stride = 1L + maxKeys.max

    // shifted keys are cast back to the source dtype WITHOUT ANSI
    // checks — an IntegerType key overflowing stride*(copies-1)+max
    // would silently wrap into colliding/negative ids and corrupt the
    // join-scaling measurements this tool exists to make honest
    for ((t, keys) <- present; k <- keys) {
      val top = stride * (copies - 1L) + (stride - 1L)
      val fits = table(t).schema(k).dataType match {
        case org.apache.spark.sql.types.LongType => true
        case org.apache.spark.sql.types.IntegerType => top <= Int.MaxValue.toLong
        case other => sys.error(s"$t.$k: unsupported key dtype $other")
      }
      require(fits, s"$t.$k: shifted ids up to $top overflow the column's " +
        s"int dtype at copies=$copies — use fewer copies or widen the key")
    }

    for (t <- CopyOnce if new java.io.File(s"$src/$t.parquet").exists())
      table(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    for ((t, keys) <- present) {
      val df = table(t)
      val replicated = df
        .withColumn("__r", explode(sequence(lit(0L), lit(copies - 1L))))
      val shifted = keys.foldLeft(replicated) { (acc, k) =>
        acc.withColumn(k, (col(k).cast("long") + col("__r") * stride)
          .cast(df.schema(k).dataType))
      }
      val perturbed =
        if (perturbText && t == "documents")
          shifted.withColumn("text",
            when(col("__r") === 0L, col("text"))
              .otherwise(concat(col("text"), lit(" rep"), col("__r"))))
        else shifted
      // one output file per replica (min 8): a realistic split count for
      // the probes — a single 600M-row file serializes the scan setup
      perturbed.drop("__r")
        .repartition(math.max(copies, 8))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale-corpus] $t x$copies (stride $stride)")
    }
  }
}
