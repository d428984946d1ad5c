package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries at
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  */
object Bench {

  /** Representative, performance-meaningful subset: scan-heavy aggs,
    * multi-join, keyed windows, per-key scans, LSH dedup, ANN.
    */
  val headline: Seq[String] = Seq(
    "tpch_q1", "tpch_q3_top_orders", "tpch_q5_region_revenue",
    "parts_by_type_revenue", "order_priority_counts", "sessionize",
    "sum_window", "by_sum", "percentiles", "coalesce_window",
    "ddt", "ewma", "throttle", "moving_event_window",
    "dedup_minhash_lsh", "dedup_minhash_lsh_xx", "dedup_simhash",
    "text_quality", "ann_topk", "ann_bucketed_topk", "ann_ivf_topk",
    "embedding_near_dup_bucketed",
    // source-decode, media-kernel, and banded near-dup throughput
    "riemann_decode", "media_features", "dedup_simhash_near")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val errors = scala.collection.mutable.ListBuffer[String]()
    def pass(): Seq[(String, Double)] = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { qs(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!errors.contains(name)) errors += name; false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // failed queries report negative time so they can't masquerade as
      // fast successes in the emitted JSON
      name -> (if (ok) secs else -secs)
    }
    // Three passes, JMH-style: the first run of each distinct query shape
    // pays one-time JVM costs — Janino compilation of its generated code,
    // C2 JIT of those classes (queued behind 32 busy cores), parquet
    // reader pools — measured at 3-15 s per query cold vs 0.5-2 s steady
    // state. The reference engine is a long-lived server, so steady-state
    // per-query time is the apples-to-apples number; the cold pass is
    // still reported (`cold_queries`) for transparency. Steady state =
    // per-query MIN of the two timed passes: C2 recompilation bursts land
    // on random queries mid-pass (observed: the same query 1.3 s in one
    // pass, 22 s in the next on an otherwise idle box), so a single timed
    // pass is noise-dominated; the min is the reproducible number.
    val cold = pass()
    val (warm1, warm2) = (pass(), pass())
    // min is also how a failure in either pass keeps its negative marker
    val results = warm1.zip(warm2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val coldTotal = cold.filter(_._2 >= 0).map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(results)},"cold_total":$coldTotal%.3f,"cold_queries":${json(cold)},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
