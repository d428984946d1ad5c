// Jobs-and-wall probe for the BM25 store protocol (r17, verdict item 5):
// time build / append / query separately on the bm25_incremental gate's
// exact split (even half built, odd half appended, gate query batch) and
// report per-face Spark JOB count and wall. Run against the r16 classes
// and the r17 classes (spark-shell --driver-class-path), same box: scores
// must be identical (fingerprint printed), only jobs/wall may differ —
// the r17 change overlaps the protocol's independent chains (guide §2.6)
// and fuses the delta count with the duplicate-id guard.
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = { jobCounter.incrementAndGet(); () }
})
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val d = graft.sources.Tables.documents(spark, sfDir)
val queries = d.filter(col("doc_id") < 8).select(col("doc_id").as("qid"), concat_ws(" ", slice(graft.functions.Text.tokens(col("text")), 1, 5)).as("qtext"))
// warm the scan shape so the timed faces measure the protocol, not parquet-footer setup
val nDocs = d.count()
def face(name: String)(body: => Unit): Unit = { val j0 = jobCounter.get; val t0 = System.nanoTime(); body; println(f"[store_jobs_probe] $name jobs=${jobCounter.get - j0} wall=${(System.nanoTime() - t0) / 1e9}%.2f s") }
val tmp = java.nio.file.Files.createTempDirectory("bm25_probe").toString
face("build")  { graft.operators.Retrieval.buildBm25Index(d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", tmp, nBuckets = 16) }
face("append") { graft.operators.Retrieval.appendBm25Index(d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", tmp) }
var fp = ""
face("query")  { val rows = graft.operators.Retrieval.queryBm25Index(spark, tmp, queries, "qid", "qtext", 10).orderBy("query_id", "rank").collect(); fp = java.security.MessageDigest.getInstance("MD5").digest(rows.map(_.toString).mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12) }
println(s"[store_jobs_probe] docs=$nDocs fp=$fp")
