package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter, for iteration]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 136 queries in one JVM: same generated-class cache sizing as
      // Bench (default 100 entries thrashes, see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Convention guard: a raw DecimalType in a gate's FINAL schema is
        // a cross-engine hash trap — Spark parquet keeps Decimal objects
        // while DuckDB's fetchdf() decays DECIMAL to float64, so the
        // driver's representation-keyed hash mismatches even when every
        // value is identical (burned corpus_profile r7, ngram_lm_score +
        // pca_covariance r9). Round through DECIMAL(38,x) for order
        // independence, then CAST(... AS DOUBLE) on BOTH sides.
        def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case _: org.apache.spark.sql.types.DecimalType => true
          case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasDecimal(f.dataType))
          case a: org.apache.spark.sql.types.ArrayType => hasDecimal(a.elementType)
          case m: org.apache.spark.sql.types.MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
          case _ => false
        }
        val decCols = df.schema.fields.collect {
          case f if hasDecimal(f.dataType) => f.name
        }
        if (decCols.nonEmpty)
          System.err.println(s"[verify] WARNING: $name emits raw DecimalType " +
            s"column(s) ${decCols.mkString(",")} — wrap in .cast(\"double\") " +
            "on both sides (see Queries.dsum) or the driver hash will mismatch")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // fixture fingerprints: which exact testdata generation this
    // correctness artifact was produced against (see sources.Fixtures)
    Files.writeString(Paths.get(s"$outDir/fixtures.json"),
      graft.sources.Fixtures.json(spark, sfDir))
    spark.stop()
  }
}
