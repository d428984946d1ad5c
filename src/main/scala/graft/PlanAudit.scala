package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan audit over the benchmark headline queries: one markdown
  * row per query with the numbers that decide 100 TB behavior — shuffle
  * exchanges, broadcast exchanges, parquet scans with pushed filters and
  * pruned read schemas, and whole-stage-codegen span count.
  *
  * Each query is EXECUTED first so the audit reads the final
  * AQE-re-planned tree (query stages materialized, codegen inserted,
  * runtime broadcast conversions applied) — the plan that actually ran,
  * not the optimizer's first guess.
  *
  * Re-runnable: `tools/run_main.sh graft.PlanAudit <sfDir>`; PLANS.md in
  * the repo root is its committed output.
  */
object PlanAudit {

  /** Children plus the trees AQE hides behind leaves: materialized query
    * stages, the adaptive root, and expression subqueries.
    */
  private def descend(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec        => Seq(s.plan)
    case other                    => other.children ++ other.subqueries
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: descend(p).flatMap(collectAll)

  /** Dedup by reference identity — structural == would collapse two
    * genuinely separate but identical-looking exchanges/scans; sharing is
    * already explicit in the tree via ReusedExchange/ReusedQueryStage.
    */
  private def identityDistinct(nodes: Seq[SparkPlan]): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    nodes.filter(seen.add)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("| query | shuffles | broadcasts | scans | pushed filters | read schema | codegen spans |")
    println("|---|---|---|---|---|---|---|")
    val qs = SparkEntry.queries
    // arg 2 (comma-separated) appends non-headline queries to the audit
    val names = Bench.headline ++
      args.drop(1).headOption.toSeq.flatMap(_.split(',')).filterNot(Bench.headline.contains)
    names.filter(qs.contains).foreach { name =>
      try {
        val df = qs(name)(spark, sfDir)
        // execute THIS QueryExecution (df.count() would plan a different
        // one) so every AQE stage materializes and codegen is inserted
        df.queryExecution.toRdd.count()
        val nodes = identityDistinct(collectAll(df.queryExecution.executedPlan))
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
        val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeLike])
        val scans = nodes.collect { case s: FileSourceScanExec => s }
        def meta(key: String): String = scans.flatMap(_.metadata.get(key))
          .map(_.replace("|", "/")).filter(v => v != "[]").distinct.mkString("; ")
        val pushed = meta("PushedFilters")
        val schemas = scans.flatMap(_.metadata.get("ReadSchema"))
          .map(_.replaceAll("struct<|>$", "").split(",").map(_.takeWhile(_ != ':'))
            .mkString(","))
          .distinct.mkString("; ")
        val wscg = nodes.count(_.isInstanceOf[WholeStageCodegenExec])
        println(s"| $name | $shuffles | $broadcasts | ${scans.size} | " +
          s"${if (pushed.isEmpty) "none" else pushed} | $schemas | $wscg |")
      } catch {
        case e: Throwable => println(s"| $name | ERROR: ${e.getMessage} | | | | | |")
      }
    }
    spark.stop()
  }
}
