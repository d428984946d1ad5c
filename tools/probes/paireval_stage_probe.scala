// Stage-level profile of the pair-relation family at the keyed x10
// corpus point (r17 scaling evidence): run one query once and print the
// top stages by summed task time, with task counts, max task duration
// and skew (max/mean) — names the stage that keeps the c8/c32 ratio
// below the ~4x a fully parallel query would show. Drive with
// PROBE_QUERY=<name> PROBE_DIR=<sfDir> spark-shell -I this-file.
import org.apache.spark.scheduler._
import scala.collection.mutable
case class St(var name: String = "", var tasks: Int = 0, var sumMs: Long = 0L, var maxMs: Long = 0L, var srRec: Long = 0L, var swRec: Long = 0L, var inRec: Long = 0L, var outRec: Long = 0L)
val stages = mutable.Map.empty[Int, St]
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = { stages.getOrElseUpdate(e.stageInfo.stageId, St()).name = e.stageInfo.rddInfos.map(_.name).distinct.mkString("|").take(120); () }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = { val s = stages.getOrElseUpdate(e.stageId, St()); s.tasks += 1; val d = e.taskInfo.duration; s.sumMs += d; s.maxMs = math.max(s.maxMs, d); val m = e.taskMetrics; if (m != null) { s.srRec += m.shuffleReadMetrics.recordsRead; s.swRec += m.shuffleWriteMetrics.recordsWritten; s.inRec += m.inputMetrics.recordsRead; s.outRec += m.outputMetrics.recordsWritten }; () }
})
val qname = sys.env.getOrElse("PROBE_QUERY", "dedup_pair_eval")
val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/keyed_x10")
val t0 = System.nanoTime()
val df = graft.SparkEntry.queries(qname)(spark, dir)
val n = df.queryExecution.toRdd.count()
println(f"[paireval_stage_probe] $qname rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
val top = stages.toSeq.sortBy(-_._2.sumMs).take(12)
top.foreach { case (id, s) => println(f"[paireval_stage_probe] stage=$id%-4d tasks=${s.tasks}%-4d sum=${s.sumMs / 1000.0}%8.1f s max=${s.maxMs / 1000.0}%7.1f s skew=${if (s.tasks > 0) s.maxMs.toDouble * s.tasks / s.sumMs else 0.0}%5.1f sr=${s.srRec}%-9d sw=${s.swRec}%-9d in=${s.inRec}%-9d ${s.name}") }
println(f"[paireval_stage_probe] total task time ${stages.values.map(_.sumMs).sum / 1000.0}%.1f s over ${stages.values.map(_.tasks).sum} tasks")
