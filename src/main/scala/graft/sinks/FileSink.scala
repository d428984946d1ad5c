package graft.sinks

import graft.ir.SinkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON-lines file sink — the Spark-native form of the reference's `file`
  * output (`/root/reference/src/clojure/mirabelle/output/file.clj:10-50`):
  * the reference templates one output path per event from field values
  * and/or a date pattern; a distributed engine expresses the same layout as
  * partition directories (`field=value/.../date=.../part-*.json`), which
  * also makes the written data partition-prunable on re-read.
  *
  * Scale: `partitionBy` produces one writer per (task × partition-value);
  * callers partition the frame by the template fields upstream when the
  * value cardinality is high.
  */
object FileSink {

  /** Partition column derived from the ns event time, mirroring the
    * reference's date templating (`output/file.clj:18-27`).
    */
  private def dateCol(pattern: String) =
    date_format(timestamp_micros(expr("time div 1000")), pattern)

  def write(df: DataFrame, spec: SinkSpec): Unit = {
    val (toWrite, partCols) = spec.datePattern match {
      case Some(p) => (df.withColumn("date", dateCol(p)), spec.partitionFields :+ "date")
      case None    => (df, spec.partitionFields)
    }
    val w = toWrite.write.mode("append")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).json(spec.path)
  }

  def write(df: DataFrame, path: String, partitionFields: Seq[String] = Nil,
            datePattern: Option[String] = None): Unit =
    write(df, SinkSpec(path, partitionFields, datePattern))

  /** Bucketed parquet materialization — the 100 TB join-locality lever:
    * a corpus written with `bucketBy(n, keys)` is hash-pre-partitioned
    * ON DISK, so every later equi-join or aggregation on those keys
    * reads co-located buckets and SKIPS its shuffle entirely (Catalyst
    * sees the bucket spec as a satisfied `HashPartitioning`). Worth it
    * for any table joined repeatedly on a stable key — dedup-pair
    * joins, model-score joins, epoch-over-epoch diffs.
    *
    * Bucketed writes go through the session catalog (`saveAsTable` —
    * plain `.parquet(path)` cannot record a bucket spec), so the frame
    * lands as managed table `table` under the warehouse dir; read it
    * back with `spark.table(table)`. Both join sides must share bucket
    * count and keys for the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    require(buckets >= 1, s"writeBucketed: buckets must be >= 1, got $buckets")
    require(keys.nonEmpty, "writeBucketed: at least one bucket key")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Parquet with per-column BLOOM FILTERS — the 100 TB point-lookup
    * lever next to [[writeBucketed]]'s join locality: a row-group whose
    * bloom filter excludes the probed value is skipped without
    * decoding, so needle queries (`doc_id = ?`, `urlkey = ?`,
    * incremental-dedup anti-joins against a small id set) read a few
    * row groups instead of the table. Complements min/max stats, which
    * only help when the column correlates with write order — hash-like
    * ids (the common corpus key) defeat min/max but are exactly what
    * blooms handle. `ndv` sizes the filter (expected distinct values
    * per row group; ~1 MB per 1M ndv at the default FPP).
    *
    * Plain writer options — no custom committer; composes with
    * `partitionFields` via the caller using `.partitionBy` upstream.
    */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     ndv: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "writeWithBloom: at least one bloom column")
    require(ndv >= 1L, s"writeWithBloom: ndv must be >= 1, got $ndv")
    val base = df.write.mode("overwrite")
    val withOpts = bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    withOpts.parquet(path)
  }

  /** Streaming twin: the same partitioned JSON-lines layout via
    * `writeStream` (exactly-once per micro-batch through the checkpoint
    * under `<path>/_checkpoints`). Returns the query handle; callers own
    * its lifecycle.
    */
  def writeStream(df: DataFrame, spec: SinkSpec): org.apache.spark.sql.streaming.StreamingQuery = {
    val (toWrite, partCols) = spec.datePattern match {
      case Some(p) => (df.withColumn("date", dateCol(p)), spec.partitionFields :+ "date")
      case None    => (df, spec.partitionFields)
    }
    val w = toWrite.writeStream.format("json")
      .option("path", spec.path)
      .option("checkpointLocation", spec.path + "/_checkpoints")
      .outputMode("append")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).start()
  }
}
