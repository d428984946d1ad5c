package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus interchange — the lingua franca of public text
  * corpora (C4, The Pile, RedPajama, Dolma all ship as `*.jsonl.gz`
  * shards). Spark's native JSON source handles gzip transparently and
  * splits cleanly across executors (one .gz member per task — gzip is
  * not splittable, so shard count = read parallelism; `writeShards`
  * makes that explicit). This wrapper pins the conventions a pipeline
  * needs: schema-first reads (no sampling-inference pass over 100 TB),
  * deterministic range-sharded exports, and a streaming landing-dir
  * twin for continuously arriving corpus drops.
  *
  * Scale notes: a schemaless `spark.read.json` runs a FULL inference
  * scan before the real one — always pass the schema. Export shards are
  * range-partitioned by id so each shard is a contiguous id interval
  * (reproducible slicing, mergeable manifests); `maxRecordsPerShard`
  * caps member size to keep single-task gunzip memory bounded.
  */
object Jsonl {

  /** Schema-first JSONL read (`.jsonl` / `.jsonl.gz`, one JSON object
    * per line). Corrupt lines land in `_corrupt_record` when the schema
    * declares it; otherwise they are dropped per Spark's PERMISSIVE
    * default with null fields.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming twin over a landing directory: new shard files are
    * picked up per micro-batch (the WARC landing-dir pattern,
    * `Warc.readStreamFiles`).
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Deterministic gzip-JSONL export: range-partition by `idCol` into
    * `shards` contiguous id intervals, sort within each shard, write
    * one `.json.gz` member per shard. Gzip members are the unit of read
    * parallelism downstream, so `shards` should be chosen for the
    * CONSUMER (≈ file count ≥ executor cores at the next stage), not
    * the producer.
    */
  def writeShards(df: DataFrame, path: String, idCol: String, shards: Int,
                  maxRecordsPerShard: Long = 0L): Unit = {
    require(shards >= 1, s"writeShards: shards must be >= 1, got $shards")
    val w = df.repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite").option("compression", "gzip")
    (if (maxRecordsPerShard > 0L)
      w.option("maxRecordsPerFile", maxRecordsPerShard) else w).json(path)
  }
}
