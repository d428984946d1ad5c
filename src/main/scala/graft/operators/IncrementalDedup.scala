package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental near-dup deduplication against a PERSISTED signature
  * store — the production shape of corpus dedup: the 100 TB corpus you
  * already accepted is never re-scanned as text; its banded MinHash
  * table IS the reusable index, and each arriving shard (a crawl day, a
  * new dump) pays only (a) its own signature pass and (b) a probe into
  * the store pruned to the sig buckets the shard actually touches.
  *
  * Store layout under `path`:
  *
  *  - `bands/sigbucket=N/…` — `(id, band, sig)` rows PARTITIONED BY
  *    `sigbucket = md5(sig) mod nBuckets`, with a parquet BLOOM FILTER
  *    on `sig`. A delta's probe list of distinct sig buckets is at most
  *    `nBuckets` values (a driver-side constant, never corpus-sized),
  *    so partition pruning skips every untouched bucket's files and the
  *    blooms skip non-colliding row groups inside touched ones — a
  *    small delta reads a sliver of the index, a huge delta degrades
  *    gracefully to the full scan that is its lower bound anyway.
  *  - `meta/` — one row `(k, rows_per_band, n_buckets)`: the signature
  *    RECIPE. Every later delta must hash with the identical recipe or
  *    collisions silently vanish; reads fail loudly on a mismatch
  *    instead.
  *
  * Delta semantics (two deterministic stages, both oracle-replayable):
  *
  *  1. `dup_store`: a delta doc sharing any (band, sig) bucket with the
  *     store is a near-dup of an already-kept doc; `dup_of` = the
  *     smallest colliding store id.
  *  2. `dup_delta`: among the remaining docs, banded LSH self-join →
  *     connected components (the diameter-independent star contraction)
  *     → every non-canonical member loses to its component minimum.
  *
  * Survivors (`kept`) are appended to the store when `update = true`,
  * making the pipeline idempotent: re-feeding the same shard marks
  * every doc `dup_store`.
  *
  * Scale: the store side arrives as a pruned parquet scan joined on
  * (band, sig) against the delta's (Materialized, typically
  * AQE-broadcastable) band table — no store-side shuffle; the
  * within-delta stage shuffles only delta-sized band rows.
  */
object IncrementalDedup {

  /** Signature recipe pinned in the store's meta table. */
  final case class StoreMeta(k: Int, rowsPerBand: Int, nBuckets: Int)

  private def bucketOf(sig: Column, nBuckets: Int): Column =
    pmod(Text.md5Hash64(sig), lit(nBuckets.toLong))

  private def bandsWithBucket(df: DataFrame, textCol: String, idCol: String,
                              m: StoreMeta): DataFrame =
    Dedup.bandTable(df, textCol, idCol, m.k, m.rowsPerBand)
      .select(col("__id").as("id"), col("band"), col("sig"),
        bucketOf(col("sig"), m.nBuckets).as("sigbucket"))

  private def writeBands(bands: DataFrame, path: String, nBuckets: Int,
                         mode: String): Unit =
    bands
      // one writer per bucket: repartition ON the partition column so a
      // bucket's rows land in one file per append, not one per task
      .repartition(nBuckets, col("sigbucket"))
      .write.mode(mode)
      .option("parquet.bloom.filter.enabled#sig", "true")
      .option("parquet.bloom.filter.expected.ndv#sig", "1000000")
      .partitionBy("sigbucket")
      .parquet(s"$path/bands")

  /** Create the store from an accepted corpus (overwrites `path`). */
  def writeStore(df: DataFrame, textCol: String, idCol: String, path: String,
                 k: Int = 8, rowsPerBand: Int = 2, nBuckets: Int = 64): Unit = {
    require(k >= 1 && rowsPerBand >= 1 && k % rowsPerBand == 0,
      s"writeStore: k ($k) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    require(nBuckets >= 1, s"writeStore: nBuckets must be >= 1, got $nBuckets")
    val meta = StoreMeta(k, rowsPerBand, nBuckets)
    // the recipe row is independent of the corpus-sized bands write:
    // overlap the two jobs (guide §2.6)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = df.sparkSession
    import spark.implicits._
    val metaWrite = Future {
      Seq((k.toLong, rowsPerBand.toLong, nBuckets.toLong))
        .toDF("k", "rows_per_band", "n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
    writeBands(bandsWithBucket(df, textCol, idCol, meta), path, nBuckets, "overwrite")
    Await.result(metaWrite, Duration.Inf)
  }

  /** Read the pinned recipe; fails loudly on a missing/empty store. */
  def readMeta(spark: SparkSession, path: String): StoreMeta = {
    val rows = spark.read.parquet(s"$path/meta")
      .select(col("k").cast("long"), col("rows_per_band").cast("long"),
        col("n_buckets").cast("long")).collect()
    require(rows.length == 1, s"readMeta: expected 1 meta row at $path, got ${rows.length}")
    val r = rows.head
    StoreMeta(r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
  }

  /** Append an already-accepted frame's signatures (same recipe). */
  def appendToStore(df: DataFrame, textCol: String, idCol: String,
                    path: String): Unit = {
    val meta = readMeta(df.sparkSession, path)
    writeBands(bandsWithBucket(df, textCol, idCol, meta), path, meta.nBuckets, "append")
  }

  /** All stored band rows: the base `bands/` layout plus any streaming
    * `delta_bands/batch=N/` appends — excluding `excludeBatch` so a
    * REPLAYED micro-batch never collides with its own signatures (the
    * exactly-once linchpin of [[dedupDeltaStream]]).
    */
  /** Repair a half-finished [[compactStore]] swap — the
    * [[SubstringStore.recoverCompaction]] rules: a live `bands/` makes
    * `bands_old`/`bands_compact_tmp` leftovers stale (swept); a missing
    * `bands/` with `bands_old/` present means the crash hit between the
    * two renames — rename the old image back (its `delta_bands` were
    * not yet deleted, so verdicts are unchanged).
    */
  private[operators] def recoverCompaction(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/bands")
    val oldDir = new org.apache.hadoop.fs.Path(s"$path/bands_old")
    val tmpDir = new org.apache.hadoop.fs.Path(s"$path/bands_compact_tmp")
    if (fs.exists(live)) {
      if (fs.exists(oldDir)) fs.delete(oldDir, true)
      if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    } else if (fs.exists(oldDir)) {
      require(fs.rename(oldDir, live),
        s"recoverCompaction: rename $oldDir -> $live failed")
      if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    }
    ()
  }

  private def readBands(spark: SparkSession, path: String,
                        excludeBatch: Option[Long]): DataFrame = {
    recoverCompaction(spark, path)
    val base = spark.read.parquet(s"$path/bands")
    val deltaDir = new org.apache.hadoop.fs.Path(s"$path/delta_bands")
    val fs = deltaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(deltaDir)) base
    else {
      val deltas = spark.read.parquet(s"$path/delta_bands")
        .filter(excludeBatch.map(b => col("batch") =!= b).getOrElse(lit(true)))
        .select("id", "band", "sig", "sigbucket")
      base.unionByName(deltas)
    }
  }

  /** The store scan pruned to the delta's touched sig buckets (a
    * driver-side list of at most nBuckets values, independent of both
    * corpus and delta size).
    */
  private def prunedStore(spark: SparkSession, path: String,
                          touched: Array[Long],
                          excludeBatch: Option[Long]): DataFrame =
    readBands(spark, path, excludeBatch)
      .filter(col("sigbucket").isin(touched: _*))

  /** Per delta id, the smallest colliding store id (`id`, `dup_of`) —
    * only ids WITH a collision appear.
    */
  def storeHits(delta: DataFrame, textCol: String, idCol: String,
                path: String, excludeBatch: Option[Long] = None): DataFrame = {
    val spark = delta.sparkSession
    val meta = readMeta(spark, path)
    // the touched-bucket set rides the Materialize job as an observed
    // metric (≤ nBuckets values) instead of a separate distinct+collect
    // job over the blocks (guide §1.2; r17 — fallback job kept defensive)
    val dBandsSrc = bandsWithBucket(delta, textCol, idCol, meta)
      .observe("graft_dedup_touched", collect_set(col("sigbucket")).as("sb"))
    val dBands = Materialize(dBandsSrc)
    val touched = dBandsSrc.queryExecution.observedMetrics.get("graft_dedup_touched")
      .map(_.getSeq[Long](0).toArray)
      .getOrElse(dBands.select(col("sigbucket")).distinct()
        .collect().map(_.getLong(0)))
    // collapse the pruned store slice to ONE row per (band, sig) BEFORE
    // the join: dup_of only needs the smallest colliding store id, and
    // min over a union of buckets == min over per-bucket minima — so a
    // store mega-bucket (10⁶ docs behind one boilerplate signature)
    // contributes one row to the join instead of 10⁶ rows PER colliding
    // delta doc. The aggregate is map-side combined over the
    // partition-pruned scan the probe already pays; without it the
    // store×delta bucket product is the same quadratic blow-up the
    // lshCandidates guard exists for, resurfacing in the probe join.
    val owners = prunedStore(spark, path, touched, excludeBatch)
      .groupBy(col("band"), col("sig")).agg(min(col("id")).as("__owner"))
    owners.as("s")
      .join(dBands.as("d"),
        col("s.band") === col("d.band") && col("s.sig") === col("d.sig"))
      .groupBy(col("d.id").as(idCol))
      .agg(min(col("__owner")).as("dup_of"))
  }

  /** Dedup one arriving shard against the store and within itself.
    * Returns `(idCol, status, dup_of)` — status ∈ {kept, dup_store,
    * dup_delta}; `dup_of` is null for kept rows. With `update = true`
    * the kept rows' signatures are appended to the store.
    */
  def dedupDelta(delta: DataFrame, textCol: String, idCol: String,
                 path: String, update: Boolean = false,
                 excludeBatch: Option[Long] = None,
                 cap: Dedup.BucketCap = Dedup.BucketCap.Auto()): DataFrame =
    dedupDeltaAudited(delta, textCol, idCol, path, update, excludeBatch, cap)._1

  /** [[dedupDelta]] with the within-delta guard's [[Dedup.LshAudit]]
    * attached (None under Unlimited or when the delta has no banded
    * docs) — the IR `dedup-delta` action writes it to `audit-path`.
    */
  def dedupDeltaAudited(delta: DataFrame, textCol: String, idCol: String,
                        path: String, update: Boolean = false,
                        excludeBatch: Option[Long] = None,
                        cap: Dedup.BucketCap = Dedup.BucketCap.Auto()): (DataFrame, Option[Dedup.LshAudit]) = {
    val spark = delta.sparkSession
    val meta = readMeta(spark, path)
    val hits = Materialize(storeHits(delta, textCol, idCol, path, excludeBatch))
    val rest = delta.join(hits.select(col(idCol)), Seq(idCol), "left_anti")
    // within-delta stage under the same default guard as the batch LSH
    // family: a boilerplate-heavy shard (one crawl day of parked
    // domains) self-joins quadratically without it. Store-hit verdicts
    // are unaffected — and since the pairs feed connected components
    // (a connectivity consumer), the guard runs in its star-edge mode:
    // a capped mega-clique still collapses to its canonical member
    // THIS shard, exactly as the unlimited run would, at linear cost.
    val (pairs, audit) = Dedup.lshCandidatesConnectivity(rest, textCol, idCol,
      meta.k, meta.rowsPerBand, cap = cap)
    val losers = Materialize(
      Dedup.clusterPairsStar(pairs)
        .filter(col("cluster") =!= col("id"))
        .select(col("id").as(idCol), col("cluster").as("__canon")))
    val out = delta.select(col(idCol))
      .join(hits.withColumnRenamed("dup_of", "__store_of"), Seq(idCol), "left")
      .join(losers, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__store_of").isNotNull, lit("dup_store"))
          .when(col("__canon").isNotNull, lit("dup_delta"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("__store_of"), col("__canon")).as("dup_of"))
    if (update) {
      val kept = delta.join(
        out.filter(col("status") === "kept").select(col(idCol)), Seq(idCol))
      appendToStore(kept, textCol, idCol, path)
    }
    (out, audit)
  }

  /** The continuously-ingesting loop: every micro-batch is a delta —
    * deduped against the store AND within itself, survivors' full rows
    * land under `outPath/batch=N/` and their signatures under
    * `<storePath>/delta_bands/batch=N/sigbucket=M/`. Sequential batches
    * therefore dedup against everything already accepted.
    *
    * Exactly-once without a transaction log: both writes are
    * per-batch-directory OVERWRITES (replay rewrites the same dirs),
    * and the probe EXCLUDES the replaying batch's own `delta_bands`
    * partition — so a batch that crashed between its two writes
    * recomputes the identical verdicts on retry instead of colliding
    * with its half-committed self and silently dropping everything.
    * Compact `delta_bands` into the base `bands/` layout offline when
    * batch count grows (a plain read-union-rewrite).
    */
  def dedupDeltaStream(stream: DataFrame, textCol: String, idCol: String,
                       storePath: String, outPath: String,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val meta = readMeta(spark, storePath)
        val verdicts = dedupDelta(batch, textCol, idCol, storePath,
          update = false, excludeBatch = Some(batchId))
        val kept = batch.join(
          verdicts.filter(col("status") === "kept").select(col(idCol)), Seq(idCol))
          .transform(Materialize.apply)
        kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        bandsWithBucket(kept, textCol, idCol, meta)
          .repartition(meta.nBuckets, col("sigbucket"))
          .write.mode("overwrite").partitionBy("sigbucket")
          .parquet(s"$storePath/delta_bands/batch=$batchId")
        ()
      }
      .start()

  /** Fold accumulated streaming `delta_bands/batch=N/` appends into the
    * base `bands/` layout — the offline maintenance step that keeps the
    * probe's file count bounded as batches accumulate. Verdicts are
    * unchanged by construction (the probe reads the union either way);
    * run it between streaming sessions, never concurrently with one.
    * Crash safety: stage-tmp → rename live ASIDE (`bands_old`) → rename
    * tmp in → delete deltas → delete old, with [[recoverCompaction]]
    * run by every read path — a crash at any step leaves a complete
    * layout recoverable on the next probe (never a moment without a
    * full `bands/` image on disk; leftover deltas re-fold idempotently).
    */
  def compactStore(spark: SparkSession, path: String): Unit = {
    recoverCompaction(spark, path)
    val meta = readMeta(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaDir = new org.apache.hadoop.fs.Path(s"$path/delta_bands")
    if (!fs.exists(deltaDir)) return // nothing to fold
    val all = readBands(spark, path, excludeBatch = None)
    val tmp = s"$path/bands_compact_tmp"
    all.repartition(meta.nBuckets, col("sigbucket"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#sig", "true")
      .option("parquet.bloom.filter.expected.ndv#sig", "1000000")
      .partitionBy("sigbucket")
      .parquet(tmp)
    val bands = new org.apache.hadoop.fs.Path(s"$path/bands")
    val oldDir = new org.apache.hadoop.fs.Path(s"$path/bands_old")
    require(fs.rename(bands, oldDir),
      s"compactStore: rename $bands -> $oldDir failed")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), bands),
      s"compactStore: rename $tmp -> $bands failed")
    fs.delete(deltaDir, true)
    fs.delete(oldDir, true)
    ()
  }

  /** Output schema of [[dedupDelta]] keyed by the id column — the
    * validate-side contract for the IR `dedup-delta` action (the store
    * is a runtime artifact, not a config-time input).
    */
  def deltaSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("status", StringType, nullable = false),
    StructField("dup_of", LongType)))
}
