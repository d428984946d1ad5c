import org.apache.spark.sql.functions._
val dir = sys.env("CHAIN_DIR")
val docs = spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"), col("text"), timestamp_seconds(col("doc_id")).as("__time"))
val t0 = System.nanoTime
val out = graft.streaming.Streaming.nearDupWithinWatermark("doc_id", "text", "__time", 1000000000L)(docs).toDF()
val matches = out.filter(col("band") >= 0).count()
val audits = out.filter(col("band") === -1L)
val exempted = audits.agg(coalesce(sum("dup_of"), lit(0L))).head.getLong(0)
val wall = (System.nanoTime - t0) / 1e9
println(f"[stwin] wall=$wall%.1f s input=${docs.count()} matches=$matches exempted=$exempted auditRows=${audits.count()}")
