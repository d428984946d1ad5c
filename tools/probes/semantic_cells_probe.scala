// Fixed-nlist vs sqrt(n) auto cells for semanticDedup at scale — the
// SCALING.md rows behind the r16 autoCellsWarning guidance. Reads the
// keyed corpus dir from CELLS_DIR (ScaleCorpus output), runs the
// guarded semanticDedup once with auto cells (ceil(sqrt(n))) and once
// with a fixed nCells pinned to the sf0.1 auto value, and prints
// wall + survivor counts + the audit.
import org.apache.spark.sql.functions._
val dir = sys.env("CELLS_DIR")
val emb = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))
val n = emb.count()
def run(tag: String, cells: Int): Unit = { val t0 = System.nanoTime; val (out, audit) = graft.operators.Similarity.semanticDedupAudited(emb, "vec_id", "embedding", nCells = cells, threshold = 0.35); val survivors = out.count(); val wall = (System.nanoTime - t0) / 1e9; println(f"[semcells] corpus=$dir n=$n form=$tag cells=${if (cells > 0) cells.toString else "auto"} wall=$wall%.1f s survivors=$survivors audit=$audit") }
run("auto", 0)
run("fixed775", 775)
