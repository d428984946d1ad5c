package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Central policy for eagerly materializing multi-consumer intermediates
  * (postings tables, signature tables, bucket-count models) so their
  * producing pipeline runs ONCE instead of once per consumer.
  *
  * Two modes, selected by the session conf `spark.graft.materialize`:
  *
  *  - `local` (default): `localCheckpoint(eager)` — blocks live on the
  *    executors that computed them and lineage is truncated. Fastest (no
  *    external IO) and exactly right on `local[n]`, but NOT fault-tolerant
  *    on a real cluster: the truncated lineage means a lost executor's
  *    blocks cannot be recomputed, failing the job ("recompute from
  *    nothing"). Fine for short-lived intermediates where a retry of the
  *    whole query is acceptable.
  *  - `reliable`: `checkpoint(eager)` to the SparkContext checkpoint dir
  *    (HDFS / object store) — survives executor loss, the cluster-grade
  *    variant for long jobs on preemptible/spot executors. Requires
  *    `sparkContext.setCheckpointDir(...)`; we fail fast with that message
  *    rather than letting Spark throw a less actionable one mid-job.
  *
  * A plain `persist(MEMORY_AND_DISK)` is deliberately NOT offered here:
  * persist keeps lineage (so it IS recomputable) but is lazy — every call
  * site in this codebase needs eager semantics because a driver-side
  * scalar read (totals, counts) immediately follows, and a lazy cache
  * would run the pipeline once for that read and again for the main
  * consumer. Callers that want lazy caching can `.persist()` themselves.
  */
object Materialize {

  val ConfKey = "spark.graft.materialize"

  /** Eagerly materialize `df` under the session's configured policy. */
  def apply(df: DataFrame): DataFrame = dataset(df)

  /** Typed variant — same policy, keeps the Dataset's encoder (used by the
    * iterative loops: BPE training, label propagation).
    */
  def dataset[T](ds: Dataset[T]): Dataset[T] =
    ds.sparkSession.conf.get(ConfKey, "local") match {
      case "local" => ds.localCheckpoint(true)
      case "reliable" =>
        val sc = ds.sparkSession.sparkContext
        require(sc.getCheckpointDir.isDefined,
          s"$ConfKey=reliable needs sparkContext.setCheckpointDir(<hdfs/s3 path>) " +
            "— reliable checkpoints are written there to survive executor loss")
        ds.checkpoint(true)
      case other =>
        throw new IllegalArgumentException(
          s"$ConfKey must be 'local' or 'reliable', got '$other'")
    }
}
