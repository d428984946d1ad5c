package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord interchange — the framed record format TensorFlow's
  * `tf.data` (and most dataset tooling around it) reads for training
  * shards. The wire format is public and tiny (TensorFlow
  * `io/record_writer.h`): per record
  *
  * {{{
  *   uint64  length          (little-endian)
  *   uint32  masked_crc32c(length bytes)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)
  * }}}
  *
  * with `mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8` over
  * CRC32C (Castagnoli — `java.util.zip.CRC32C`, hardware-accelerated on
  * modern JVMs). Both CRCs are verified on read; a corrupt or truncated
  * frame ends the walk with the records parsed before it (the
  * [[Warc]] totality convention — a poisoned shard must not fail the
  * job).
  *
  * Scale shape mirrors [[Warc]]: framing is a per-row kernel behind a
  * codegen'd expression, parsing is map-side `mapPartitions` with
  * file-level parallelism, export writes one shard per partition
  * executor-side. Shard size is the caller's partitioning knob.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8

  /** TensorFlow's masked CRC32C. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  /** One framed TFRecord for a payload — the serialization kernel. */
  def recordBytes(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + 4 + payload.length + 4)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(payload.length.toLong)
    bb.putInt(maskedCrc(out, 0, 8))
    bb.put(payload)
    bb.putInt(maskedCrc(payload, 0, payload.length))
    out
  }

  /** Frame a binary payload column as one TFRecord (codegen'd). */
  def frame(payload: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(TfRecordFrame(B.expression(payload)))
  }

  /** Walk a shard blob into payloads. TOTAL: a length/data CRC mismatch,
    * an insane length, or truncation ends the walk with what parsed
    * clean before it.
    */
  def parseRecords(raw: Array[Byte]): Seq[Array[Byte]] = {
    if (raw == null) return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    var bad = false
    while (!bad && i + 12 <= raw.length) {
      val bb = java.nio.ByteBuffer.wrap(raw, i, 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val len = bb.getLong
      val lenCrc = bb.getInt
      if (lenCrc != maskedCrc(raw, i, 8) ||
          len < 0 || len > raw.length.toLong - i - 16) bad = true
      else {
        val n = len.toInt
        val dataCrc = java.nio.ByteBuffer.wrap(raw, i + 12 + n, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        if (dataCrc != maskedCrc(raw, i + 12, n)) bad = true
        else {
          out += java.util.Arrays.copyOfRange(raw, i + 12, i + 12 + n)
          i += 12 + n + 4
        }
      }
    }
    out.result()
  }

  /** Explode shard blobs into payload rows: caller's columns plus
    * `payload: binary`. Map-side, no shuffle.
    */
  def records(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add(StructField("payload", BinaryType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        parseRecords(bytes).iterator.map(p => Row.fromSeq(r.toSeq :+ p))
      }
    }(enc)
  }

  /** Read a directory of `.tfrecord[.gz]` shards into payload rows
    * (gzip members inflated whole — the compression `tf.data` calls
    * `compression_type="GZIP"`).
    */
  def readFiles(spark: SparkSession, path: String): DataFrame =
    records(
      spark.read.format("binaryFile").load(path)
        .select(col("path"), col("modificationTime"),
          inflateIfGz(col("path"), col("content")).as("content")),
      "content").drop("content")

  /** Streaming twin of [[readFiles]] over a landing directory. */
  def readStreamFiles(spark: SparkSession, path: String): DataFrame = {
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    records(
      spark.readStream.format("binaryFile").schema(binarySchema).load(path)
        .select(col("path"), col("modificationTime"),
          inflateIfGz(col("path"), col("content")).as("content")),
      "content").drop("content")
  }

  private def inflateIfGz(path: Column, content: Column): Column =
    when(path.endsWith(".gz"), unGzip(content)).otherwise(content)

  private def unGzip(c: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(GunzipWhole(B.expression(c)))
  }

  /** Gunzip a whole blob; null/garbage input → empty. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return Array.emptyByteArray
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => Array.emptyByteArray }
  }

  /** Export framed records ([[frame]]) as one `.tfrecord[.gz]` shard per
    * partition under `dir` — executor-side Hadoop FS writes, the
    * [[Warc.writeArchives]] pattern; returns the written paths.
    */
  def writeShards(df: DataFrame, recordCol: String, dir: String,
                  gzip: Boolean = false): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val entries = df.sparkSession.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    df.select(col(recordCol)).rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        entries.foreach { case (k, v) => conf.set(k, v) }
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d$ext")
        val fs = path.getFileSystem(conf)
        val raw = fs.create(path, true)
        val out: java.io.OutputStream =
          if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
        try rows.foreach(r => out.write(r.getAs[Array[Byte]](0)))
        finally out.close()
        Iterator(path.toString)
      }
    }.collect().toSeq.sorted
  }
}

/** TFRecord framing of a binary child — see [[TfRecord]]. */
case class TfRecordFrame(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    TfRecord.recordBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.TfRecord.recordBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-blob gunzip (null/garbage → empty) — see [[TfRecord]]. */
case class GunzipWhole(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    TfRecord.gunzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.TfRecord.gunzip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
