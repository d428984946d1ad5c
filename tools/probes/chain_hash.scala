// Whole-chain probe, r14 shape (plain hash split) for the same-box contrast.
import org.apache.spark.sql.functions._
import graft.operators._
val dir = sys.env("CHAIN_DIR")
val docs = spark.read.parquet(dir + "/documents.parquet").select("doc_id", "text")
def count(df: org.apache.spark.sql.DataFrame) = df.count()
val t0 = System.nanoTime
val sp = Materialize(Sampling.splitByHash(docs, "doc_id", Seq("train" -> 0.9, "bench" -> 0.1), salt = "split"))
val train = sp.filter(col("split") === "train").drop("split")
val bench = sp.filter(col("split") === "bench").drop("split")
val nTrain = count(train); val nBench = count(bench)
val q = Materialize(train.filter(graft.functions.Quality.gopherSignals(col("text")).getField("keep") === 1L))
val nQ = count(q)
val ex = Materialize(Dedup.exact(q, "text", "doc_id"))
val nEx = count(ex)
val (pruned0, pruneAudit) = Dedup.pruneNearDupsAudited(ex, "text", "doc_id", 8, 2, cap = Dedup.BucketCap.Auto())
val pruned = Materialize(pruned0)
val nPruned = count(pruned)
val clean = Materialize(Decontam.decontaminate(pruned, bench, "doc_id", "text", 3))
val nClean = count(clean)
val wall = (System.nanoTime - t0) / 1e9
println(f"[chain-hash] wall=$wall%.1f s input=${count(docs)} train=$nTrain bench=$nBench quality=$nQ exact=$nEx pruned=$nPruned clean=$nClean")
println(s"[chain-hash] prune audit: $pruneAudit")
