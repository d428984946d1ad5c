import org.apache.spark.sql.functions._
val n = 200000L
val docs = spark.range(n).select(col("id").as("doc_id"), lit("the same parked domain boilerplate body verbatim").as("text"), timestamp_seconds(col("id")).as("__time"))
val t0 = System.nanoTime
val out = graft.streaming.Streaming.nearDupWithinWatermark("doc_id", "text", "__time", 1000000000L, maxMatchesPerBucket = 4096)(docs).toDF()
val matches = out.filter(col("band") >= 0).count()
val exempted = out.filter(col("band") === -1L).agg(coalesce(sum("dup_of"), lit(0L))).head.getLong(0)
val wall = (System.nanoTime - t0) / 1e9
println(f"[sdegen] wall=$wall%.1f s input=$n matches=$matches exempted=$exempted")
