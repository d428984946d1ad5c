package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV/TSV corpus interchange — the format tabular metadata, label
  * sets, and crawl seed lists actually arrive in. Spark's native CSV
  * source (univocity under the hood) handles RFC 4180 quoting,
  * embedded newlines inside quoted fields, and gzip transparently;
  * this wrapper pins the same conventions as [[Jsonl]]: schema-first
  * reads (no inference pass over the corpus), hostile-row capture
  * instead of task failure, deterministic range-sharded exports, and a
  * streaming landing-dir twin.
  *
  * Scale notes: schemaless CSV reads run a FULL inference scan first —
  * always pass the schema. `multiLine` (needed for embedded newlines)
  * makes a file non-splittable; exports here always quote-escape, and
  * the range-sharded layout keeps per-member size bounded, so the
  * consumer's parallelism is the shard count either way — same
  * contract as gzip-JSONL.
  */
object Csv {

  /** Schema-first delimited read. Malformed rows land in
    * `_corrupt_record` when the schema declares it (PERMISSIVE mode —
    * a hostile line must never fail a 100 TB job). `header = true`
    * skips a leading header row; `multiLine` parses quoted embedded
    * newlines (per-file parse — see scale note above).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ",", header: Boolean = false,
           multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("escape", "\"") // match writeShards' RFC 4180 doubled quotes
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Streaming twin over a landing directory (new shard files per
    * micro-batch — the WARC/JSONL landing-dir pattern).
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 delimiter: String = ",", header: Boolean = false): DataFrame =
    spark.readStream.schema(schema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("escape", "\"")
      .csv(path)

  /** Deterministic gzip-CSV export: range-partition by `idCol` into
    * contiguous id intervals, sort within each shard, one `.csv.gz`
    * member per shard, ALWAYS quoted-escaped (embedded delimiters,
    * quotes, and newlines round-trip losslessly).
    */
  def writeShards(df: DataFrame, path: String, idCol: String, shards: Int,
                  delimiter: String = ",", header: Boolean = false,
                  maxRecordsPerShard: Long = 0L): Unit = {
    require(shards >= 1, s"writeShards: shards must be >= 1, got $shards")
    val w = df.repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("quoteAll", "true")
      .option("escape", "\"") // RFC 4180: escape a quote by doubling it
      // univocity trims edge whitespace ON WRITE by default — lossy
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    (if (maxRecordsPerShard > 0L)
      w.option("maxRecordsPerFile", maxRecordsPerShard) else w).csv(path)
  }
}
