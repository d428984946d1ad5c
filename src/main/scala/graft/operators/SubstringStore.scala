package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact-substring dedup against a PERSISTED window-hash
  * store — the production shape of Lee et al. 2022's ExactSubstr at
  * corpus scale (the [[IncrementalDedup]] pattern for the substring
  * family): the accepted corpus's distinct length-`minLen` window
  * hashes ARE the reusable index, so each arriving shard pays only its
  * own window pass plus a probe pruned to the hash buckets it touches —
  * the 100 TB corpus is never re-tokenized. A suffix array over the
  * union would be rebuilt per delta; the window-hash reduction is what
  * makes the operation incremental at all (same equivalence
  * [[Dedup.sharedSubstringSpans]] builds on: a shared substring of
  * length ≥ minLen ≡ a run of shared minLen-windows).
  *
  * Store layout under `path`:
  *
  *  - `hashes/hashbucket=N/…` — DISTINCT `(h, owner)` rows: each stored
  *    window hash with the smallest doc id that contains it, partitioned
  *    by `hashbucket = h mod nBuckets` with a parquet BLOOM on `h`. A
  *    delta's distinct touched buckets (≤ nBuckets driver-side values)
  *    prune the probe read; blooms skip non-colliding row groups inside
  *    touched partitions.
  *  - `meta/` — `(min_len, n_buckets)`: the window recipe, pinned like
  *    the dedup store's signature recipe — probing with a different
  *    minLen would silently miss every hash, so reads fail loudly.
  *
  * Semantics: the store is the KEEPER by construction (its docs were
  * accepted first), so every probed span in a delta doc is a CUT span —
  * the keep-first rule with ownership resolved by arrival order, which
  * is exactly how [[Dedup.sharedSubstringSpans]]'s `keepFirst` resolves
  * it by id inside one batch. Within-delta sharing is deliberately NOT
  * the probe's job: compose `sharedSubstringSpans(delta, keepFirst)`
  * for that stage, same as [[IncrementalDedup.dedupDelta]]'s two-stage
  * split.
  */
object SubstringStore {

  final case class StoreMeta(minLen: Int, nBuckets: Int)

  private def bucketOf(h: Column, nBuckets: Int): Column =
    pmod(h, lit(nBuckets.toLong))

  /** (id, p, h, hashbucket) — one row per window start position. */
  private def windows(df: DataFrame, textCol: String, idCol: String,
                      m: StoreMeta): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(Dedup.windowHashes(Text.tokens(col(textCol)), m.minLen,
          Text.md5HashMod)).as(Seq("__p0", "h")))
      .select(col("id"), (col("__p0") + 1).cast("long").as("p"), col("h"),
        bucketOf(col("h"), m.nBuckets).as("hashbucket"))

  private def writeHashes(ws: DataFrame, path: String, nBuckets: Int,
                          mode: String): Unit =
    ws.groupBy("hashbucket", "h").agg(min(col("id")).as("owner"))
      .repartition(nBuckets, col("hashbucket"))
      .write.mode(mode)
      .option("parquet.bloom.filter.enabled#h", "true")
      .option("parquet.bloom.filter.expected.ndv#h", "1000000")
      .partitionBy("hashbucket")
      .parquet(s"$path/hashes")

  /** Create the store from an accepted corpus (overwrites `path`). */
  def writeStore(df: DataFrame, textCol: String, idCol: String, path: String,
                 minLen: Int = 50, nBuckets: Int = 64): Unit = {
    require(minLen >= 1, s"writeStore: minLen must be >= 1, got $minLen")
    require(nBuckets >= 1, s"writeStore: nBuckets must be >= 1, got $nBuckets")
    val meta = StoreMeta(minLen, nBuckets)
    // the recipe row is independent of the corpus-sized hashes write:
    // overlap the two jobs (guide §2.6 — the IncrementalDedup.writeStore
    // discipline, applied here in r17)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = df.sparkSession
    import spark.implicits._
    val metaWrite = Future {
      Seq((minLen.toLong, nBuckets.toLong)).toDF("min_len", "n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
    writeHashes(windows(df, textCol, idCol, meta), path, nBuckets, "overwrite")
    Await.result(metaWrite, Duration.Inf)
  }

  /** Read the pinned window recipe; fails loudly on a missing store. */
  def readMeta(spark: SparkSession, path: String): StoreMeta = {
    val rows = spark.read.parquet(s"$path/meta")
      .select(col("min_len").cast("long"), col("n_buckets").cast("long"))
      .collect()
    require(rows.length == 1, s"readMeta: expected 1 meta row at $path, got ${rows.length}")
    StoreMeta(rows.head.getLong(0).toInt, rows.head.getLong(1).toInt)
  }

  /** All stored hash rows: the base `hashes/` layout plus any streaming
    * `delta_hashes/batch=N/` appends — excluding `excludeBatch` so a
    * REPLAYED micro-batch never probes its own hashes (the exactly-once
    * linchpin of [[cutDeltaStream]], same as
    * [[IncrementalDedup.dedupDeltaStream]]'s band exclusion).
    */
  private def readHashes(spark: SparkSession, path: String,
                         excludeBatch: Option[Long]): DataFrame = {
    recoverCompaction(spark, path)
    val base = spark.read.parquet(s"$path/hashes")
    val deltaDir = new org.apache.hadoop.fs.Path(s"$path/delta_hashes")
    val fs = deltaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(deltaDir)) base
    else {
      val deltas = spark.read.parquet(s"$path/delta_hashes")
        .filter(excludeBatch.map(b => col("batch") =!= b).getOrElse(lit(true)))
        .select("hashbucket", "h", "owner")
      base.select("hashbucket", "h", "owner").unionByName(deltas)
    }
  }

  /** Cut spans of a delta against the store: `(idCol, begin_tok,
    * end_tok, n_tokens)` — 1-based inclusive disjoint spans per delta
    * doc covering every maximal run of window starts whose hash exists
    * in the store (same gaps-and-islands algebra as
    * [[Dedup.sharedSubstringSpans]]). The store side is a pruned,
    * bloom-skipped scan semi-joined to the delta's hashes; only the
    * delta's window table ever shuffles. Skew note: the store side is
    * DISTINCT per hash (one row per h), so a boilerplate hash ubiquitous
    * in the delta never multiplies rows through the semi-join, and the
    * fat delta-side partition is AQE-skew-splittable — unlike a window
    * over `partitionBy(h)`, which this operator deliberately avoids.
    */
  def probeDelta(delta: DataFrame, textCol: String, idCol: String,
                 path: String, excludeBatch: Option[Long] = None): DataFrame = {
    val spark = delta.sparkSession
    val m = readMeta(spark, path)
    val dw = Materialize(windows(delta, textCol, idCol, m))
    val touched = dw.select("hashbucket").distinct().collect().map(_.getLong(0))
    val store = readHashes(spark, path, excludeBatch)
      .filter(col("hashbucket").isin(touched: _*))
      .select(col("h"))
    val hits = dw.join(store, Seq("h"), "left_semi")
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p"))
    val lagP = lag(col("p"), 1).over(wd)
    hits
      .withColumn("__new", when(lagP.isNull || col("p") - lagP > m.minLen, 1L)
        .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("p")).as("begin_tok"),
        (max(col("p")) + lit((m.minLen - 1).toLong)).as("end_tok"))
      .select(col("id").as(idCol), col("begin_tok"), col("end_tok"),
        (col("end_tok") - col("begin_tok") + 1).as("n_tokens"))
  }

  /** Merge a delta's window hashes into the store (touched buckets
    * only, dynamic partition overwrite — the
    * [[Retrieval.appendBm25Index]] df-merge shape): new hashes arrive
    * with the delta's min id as owner, existing hashes keep
    * `min(old owner, delta owner)` — arrival order preserved since
    * store ids predate delta ids in any sane id scheme, and the min is
    * deterministic regardless. Run AFTER cutting/accepting the delta
    * (store what you kept, like [[IncrementalDedup]]'s survivors rule).
    */
  def appendDelta(delta: DataFrame, textCol: String, idCol: String,
                  path: String): Unit = {
    val spark = delta.sparkSession
    val m = readMeta(spark, path)
    val dh = Materialize(windows(delta, textCol, idCol, m)
      .groupBy("hashbucket", "h").agg(min(col("id")).as("owner")))
    val touched = dh.select("hashbucket").distinct().collect().map(_.getLong(0))
    val merged = spark.read.parquet(s"$path/hashes")
      .filter(col("hashbucket").isin(touched: _*))
      .select(col("hashbucket"), col("h"), col("owner"))
      .unionByName(dh.select(col("hashbucket"), col("h"), col("owner")))
      .groupBy("hashbucket", "h").agg(min(col("owner")).as("owner"))
      .localCheckpoint() // breaks lineage to the files the write replaces
    merged.repartition(math.max(touched.length, 1), col("hashbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.bloom.filter.enabled#h", "true")
      .option("parquet.bloom.filter.expected.ndv#h", "1000000")
      .partitionBy("hashbucket").parquet(s"$path/hashes")
  }

  /** The continuously-ingesting cut loop — "remove already-seen text as
    * the crawl arrives": every micro-batch probes the store, its
    * store-shared spans are CUT, the cut documents land under
    * `outPath/batch=N/` and the KEPT content's window hashes under
    * `<storePath>/delta_hashes/batch=N/` — so sequential batches dedup
    * against everything already accepted, including earlier batches.
    *
    * Exactly-once without a transaction log, exactly as
    * [[IncrementalDedup.dedupDeltaStream]]: both writes are per-batch-
    * directory OVERWRITES (replay rewrites the same dirs) and the probe
    * EXCLUDES the replaying batch's own `delta_hashes` partition — a
    * batch that crashed between its writes recomputes identical cuts on
    * retry instead of probing its half-committed self (which would cut
    * every document to nothing). Fold `delta_hashes` into the base
    * layout with [[compactStore]] between sessions.
    */
  def cutDeltaStream(stream: DataFrame, textCol: String, idCol: String,
                     storePath: String, outPath: String,
                     checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val m = readMeta(spark, storePath)
        val spans = probeDelta(batch, textCol, idCol, storePath,
          excludeBatch = Some(batchId))
        val cut = Materialize(Dedup.cutBySpans(batch, spans, textCol, idCol))
        cut.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        windows(cut, textCol, idCol, m)
          .groupBy("hashbucket", "h").agg(min(col("id")).as("owner"))
          .repartition(m.nBuckets, col("hashbucket"))
          .write.mode("overwrite").partitionBy("hashbucket")
          .parquet(s"$storePath/delta_hashes/batch=$batchId")
        ()
      }
      .start()

  /** Fold accumulated streaming `delta_hashes/batch=N/` appends into
    * the base `hashes/` layout via the min-owner merge — the offline
    * maintenance step bounding the probe's file count. Probe results
    * unchanged by construction (the probe reads the union either way);
    * never run concurrently with a streaming session.
    *
    * Crash safety: the swap is stage-tmp → rename live ASIDE
    * (`hashes_old`) → rename tmp in → delete deltas → delete old, and
    * every read path first runs [[recoverCompaction]], so a crash at
    * ANY step leaves a store the next probe (or compaction) restores to
    * a complete layout: either the original (`hashes_old` renamed
    * back, deltas still present) or the compacted one (leftover
    * `hashes_old`/`delta_hashes` are stale-but-idempotent — the
    * min-owner merge over the union gives the same answer — and are
    * swept). There is never a moment after which no complete `hashes`
    * image exists on disk.
    */
  def compactStore(spark: SparkSession, path: String): Unit = {
    recoverCompaction(spark, path)
    val m = readMeta(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaDir = new org.apache.hadoop.fs.Path(s"$path/delta_hashes")
    if (!fs.exists(deltaDir)) return // nothing to fold
    val tmp = s"$path/hashes_compact_tmp"
    readHashes(spark, path, excludeBatch = None)
      .groupBy("hashbucket", "h").agg(min(col("owner")).as("owner"))
      .repartition(m.nBuckets, col("hashbucket"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#h", "true")
      .option("parquet.bloom.filter.expected.ndv#h", "1000000")
      .partitionBy("hashbucket")
      .parquet(tmp)
    val hashesDir = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val oldDir = new org.apache.hadoop.fs.Path(s"$path/hashes_old")
    require(fs.rename(hashesDir, oldDir),
      s"compactStore: rename $hashesDir -> $oldDir failed")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), hashesDir),
      s"compactStore: rename $tmp -> $hashesDir failed")
    fs.delete(deltaDir, true)
    fs.delete(oldDir, true)
    ()
  }

  /** Repair any half-finished [[compactStore]] swap — called by every
    * read path (cheap `exists` checks when nothing is wrong). Rules:
    * if `hashes/` exists, any `hashes_old`/`hashes_compact_tmp`
    * leftovers are stale (the new image is complete; lingering
    * `delta_hashes` re-fold idempotently) — delete them. If `hashes/`
    * is MISSING and `hashes_old/` exists, the crash hit between the two
    * renames — rename the old image back (its `delta_hashes` were not
    * yet deleted, so nothing is lost) and drop the tmp stage.
    */
  private[operators] def recoverCompaction(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hashesDir = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val oldDir = new org.apache.hadoop.fs.Path(s"$path/hashes_old")
    val tmpDir = new org.apache.hadoop.fs.Path(s"$path/hashes_compact_tmp")
    if (fs.exists(hashesDir)) {
      if (fs.exists(oldDir)) fs.delete(oldDir, true)
      if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    } else if (fs.exists(oldDir)) {
      require(fs.rename(oldDir, hashesDir),
        s"recoverCompaction: rename $oldDir -> $hashesDir failed")
      if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    }
    ()
  }
}
