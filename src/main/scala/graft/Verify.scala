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
        // Dtype-whitelist lint, HARD per-gate assertion (promoted from
        // the r9 decimal warning after the r10 pack_boundaries burn —
        // same genus, new disguise): every gated output column must be
        // an engine-stable scalar type. Outside the whitelist, Spark
        // parquet and DuckDB fetchdf() can represent the SAME values
        // differently (Decimal objects vs float64 r7/r9; HUGEINT window
        // sums decaying to float64 r10) and the driver's
        // representation-keyed hash mismatches with every value equal.
        // Allowed: long, int, double-after-decimal-round, string, bool,
        // date. A violating gate fails HERE, loudly, in dev — not three
        // days later in the driver's hash column.
        locally {
          import org.apache.spark.sql.types._
          val ok: DataType => Boolean = {
            case LongType | IntegerType | DoubleType | StringType |
                 BooleanType | DateType => true
            case _ => false
          }
          val bad = df.schema.fields.filterNot(f => ok(f.dataType))
          require(bad.isEmpty, s"dtype lint: gate '$name' emits non-whitelisted " +
            s"column(s) ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")} " +
            "— allowed: bigint, int, double, string, boolean, date " +
            "(cast on BOTH sides; see the pack_boundaries r10 note)")
        }
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
