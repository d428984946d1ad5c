package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for named queries into one file per
  * query — the committed evidence behind plan-shape claims in the
  * optimization notes (`plans/rNN/<query>_<suffix>.txt`).
  *
  * Each query is EXECUTED first (noop count over its own QueryExecution)
  * so the dump shows the final AQE-re-planned tree, then the formatted
  * explain of that executed plan is written.
  *
  * Usage: `tools/run_main.sh graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,…`
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,…>")
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries
    names.foreach { name =>
      require(qs.contains(name), s"unknown query: $name")
      try {
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val df = qs(name)(spark, sfDir)
        df.queryExecution.toRdd.count() // materialize AQE final plan
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          formatted.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
