// Jobs-per-train probe behind the SCALING.md "batched trainer job
// count" row (r16 item 10): train BPE with numMerges=64 (the
// production direction — the gate trains 8) on the sf0.1 gate
// vocabulary and report Spark JOB count, trainer pass count, merge
// list fingerprint, and wall time. Run against the baseline classes
// and the optimized classes (spark-shell --driver-class-path), same
// box: the merge fingerprint must be identical (batched == sequential
// on both trees), only jobs/wall may differ.
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = { jobCounter.incrementAndGet(); () }
})
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val docs = graft.sources.Tables.documents(spark, sfDir).select(col("text"))
val words = graft.operators.Tokenizer.wordCounts(docs, "text")
  .filter(length(col("word")).between(3, 12) &&
    size(array_distinct(split(col("word"), ""))) === length(col("word")))
// warm the scan + wordCounts shape once so the timed region is the trainer
val nWords = words.count()
val j0 = jobCounter.get
val t0 = System.nanoTime()
val merges = graft.operators.Tokenizer.trainBpeWordsBatched(words, 64, 2L).collect()
val wall = (System.nanoTime() - t0) / 1e9
val jobs = jobCounter.get - j0
val fp = java.security.MessageDigest.getInstance("MD5").digest(
  merges.map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getString(2)}|${r.getLong(3)}")
    .mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
println(f"[bpe_jobs_probe] words=$nWords merges=${merges.length} passes=${graft.operators.Tokenizer.lastBatchedPasses} jobs=$jobs wall=$wall%.2f s fp=$fp")
