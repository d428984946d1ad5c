// Plan-size probe behind the SCALING.md "centroid kernel" rows: the
// r15-era LITERAL assignment form (one typedLit float-array + cosine
// sub-tree PER CENTROID in the expression tree) vs the r16
// reference-object CentroidTopK kernel, at growing codebook sizes.
// Reports analysis+optimize wall, optimized-plan expression node count,
// java-serialized executed-plan bytes (what per-task binding pays), and
// the end-to-end count() wall on a 100k-row frame.
import org.apache.spark.sql.functions._
val dim = 64
val nrows = 100000L
val rng = new scala.util.Random(7)
val df = spark.range(nrows).select(col("id"), transform(sequence(lit(1), lit(dim)), i => pmod(col("id") * i.cast("long") + i, lit(97L)).cast("float")).as("v")).cache()
val warm = df.count()
def cents(cells: Int): Array[(Long, Seq[Float])] = Array.tabulate(cells)(j => (j.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
def literalBest(cs: Array[(Long, Seq[Float])]) = array_max(array(cs.map { case (cid, cv) => struct(graft.functions.VectorExpressions.cosineF(col("v"), typedLit(cv)).as("cc"), lit(-cid).as("negCell")) }.toIndexedSeq: _*))
def kernelBest(cs: Array[(Long, Seq[Float])]) = graft.functions.VectorExpressions.centroidBest(col("v"), cs)
def planBytes(q: org.apache.spark.sql.DataFrame): Long = scala.util.Try { val bos = new java.io.ByteArrayOutputStream(); val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(q.queryExecution.executedPlan); oos.close(); bos.size.toLong }.getOrElse(-1L)
def probe(tag: String, cells: Int, mk: Array[(Long, Seq[Float])] => org.apache.spark.sql.Column): Unit = { val cs = cents(cells); val t0 = System.nanoTime; val q = df.select((-mk(cs)("negCell")).as("cell")); val opt = q.queryExecution.optimizedPlan; val nodes = opt.expressions.map(_.collect { case e => e }.size).sum; val tAnalyze = (System.nanoTime - t0) / 1e9; val bytes = planBytes(q); val t1 = System.nanoTime; val n = q.filter(col("cell") >= 0).count(); val tRun = (System.nanoTime - t1) / 1e9; println(f"[centplan] form=$tag cells=$cells analyze=$tAnalyze%.2f s exprNodes=$nodes planBytes=$bytes run=$tRun%.2f s rows=$n") }
probe("kernel", 1024, kernelBest)
probe("literal", 1024, literalBest)
probe("kernel", 4096, kernelBest)
probe("literal", 4096, literalBest)
probe("kernel", 16384, kernelBest)
probe("literal", 16384, literalBest)
