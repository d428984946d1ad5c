// WordPiece twin of bpe_jobs_probe.scala (SCALING.md r16 item-10 rows):
// train 64 WordPiece merges on the sf0.1 gate vocabulary, report Spark
// JOB count, trainer wall, and the merge-list fingerprint. Run against
// baseline and round-end classes; fingerprints must match.
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
val nWords = words.count()
val j0 = jobCounter.get
val t0 = System.nanoTime()
val merges = graft.operators.WordPiece.trainWordPieceWordsBatched(words, 64, 2L).collect()
val wall = (System.nanoTime() - t0) / 1e9
val jobs = jobCounter.get - j0
val fp = java.security.MessageDigest.getInstance("MD5").digest(
  merges.map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getString(2)}|${r.getDouble(3)}|${r.getLong(4)}")
    .mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
println(f"[wp_jobs_probe] words=$nWords merges=${merges.length} jobs=$jobs wall=$wall%.2f s fp=$fp")
