// Keyed x10/x100 row for the r16 embedding (sign-bucket) stream twin's
// batch face under the default histogram-resolved Auto cap. Reads the
// corpus dir from CHAIN_DIR (ScaleCorpus output).
import org.apache.spark.sql.functions._
val dir = sys.env("CHAIN_DIR")
val emb = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding")).withColumn("__time", timestamp_seconds(col("vec_id")))
val n = emb.count()
val t0 = System.nanoTime
val out = graft.streaming.Streaming.embeddingNearDupWithinWatermark("vec_id", "embedding", "__time", 1000000000L, bits = 8)(emb).toDF()
val agg = out.agg(sum(when(col("band") >= 0, 1L).otherwise(0L)).as("m"), sum(when(col("band") === -1L, col("dup_of")).otherwise(0L)).as("ex")).head
val wall = (System.nanoTime - t0) / 1e9
println(f"[embtwin] corpus=$dir n=$n wall=$wall%.1f s matches=${agg.getLong(0)} exempted=${agg.getLong(1)}")
