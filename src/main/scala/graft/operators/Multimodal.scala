package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct.
  *
  * The container has no media codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but everything Spark-side is real
  * and tested: the schema, the binary column handling, the
  * `mapPartitions` batch shape (state per partition, iterator-to-iterator
  * so 100 TB of media streams through without materializing a partition),
  * and the partition sizing story (media rows are wide, so plans should
  * `repartitionByRange` on the id to keep task inputs near
  * `spark.sql.files.maxPartitionBytes`).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Attach a synthetic binary payload to a text corpus (deterministic
    * fake bytes = utf8 of the text) so the binary path is exercised
    * end-to-end without codec deps.
    */
  def synthesize(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      (when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      struct(length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** Decoded features row. `width`/`height`/`duration_ms` come from the
    * STUB decoder below — swap [[decodeStub]] for a real codec binding in
    * production; the surrounding plan does not change.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** STUB decode kernel: deterministic pseudo-dimensions derived from the
    * payload bytes. A real implementation would hand `bytes` to a codec;
    * the signature (bytes in, fixed-width features out) is the contract.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = if (bytes == null) 0 else bytes.length
    val head = if (n > 0) java.lang.Byte.toUnsignedInt(bytes(0)) else 0
    (16 + (head % 64) * 16, 16 + (n % 64) * 16, n.toLong * 20L)
  }

  /** Decode / feature-extract over the binary column: iterator-to-iterator
    * `mapPartitions` (the Scala analog of a vectorized batch UDF) — per-row
    * codec state could be hoisted per partition here.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "payload", "media_type", "meta.n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, d) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), r.getString(2), r.getLong(3), w, h, d)
        }
      }(enc)
  }

  /** STUB resize kernel: "scale" the payload to at most `w*h` bytes by
    * taking every `step`-th byte (`step = n / n_out`) — a deterministic
    * stand-in for an image resampler with the real contract (bytes in,
    * smaller bytes + new dims out). Selected positions `i*step` for
    * `i < n_out` stay in range because `(n_out-1) * (n / n_out) < n`.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = if (bytes == null) 0 else bytes.length
    if (n == 0) Array.emptyByteArray
    else {
      val nOut = math.min(n, w * h)
      val step = n / nOut
      Array.tabulate(nOut)(i => bytes(i * step))
    }
  }

  /** Resize over the binary column: same iterator-to-iterator
    * `mapPartitions` shape as [[decode]]; emits the resized payload and
    * its target dims so downstream stages see a normal media frame.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("payload", BinaryType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload", "media_type")
      .mapPartitions { rows =>
        rows.map { r =>
          val out = resizeStub(r.getAs[Array[Byte]]("payload"), w, h)
          Row(r.getLong(0), r.getString(2), out, out.length.toLong, w, h)
        }
      }(enc)
  }

  /** STUB feature-extract kernel: `dim` whole-valued floats, feature j =
    * unsigned byte at position `(j*31) mod n` — integer-valued so the
    * DuckDB oracle compares exactly across float/double. A real
    * implementation hands bytes to a vision/audio encoder; the contract
    * (bytes in, fixed-dim `Array[Float]` out) is what the plan depends on.
    */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val n = if (bytes == null) 0 else bytes.length
    Array.tabulate(dim)(j =>
      if (n == 0) 0.0f
      else java.lang.Byte.toUnsignedInt(bytes((j * 31) % n)).toFloat)
  }

  /** Feature extraction over the binary column → embedding rows
    * compatible with the ANN/similarity operators (`Array[Float]`
    * `features` column).
    */
  def featureExtract(media: DataFrame, dim: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), featureStub(r.getAs[Array[Byte]]("payload"), dim).toSeq)
        }
      }(enc)
  }

  /** Frame-sample: take every `stride`-th byte offset of the payload as a
    * "frame" (stub for video frame extraction); one row per sampled frame.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .select(col("media_id"), length(col("payload")).cast("long").as("__len"))
      .filter(col("__len") > 0)
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0L), expr(s"(__len - 1) div ${stride}")),
          i => i * stride)).as(Seq("frame_no", "byte_offset")))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        col("byte_offset").cast("long").as("byte_offset"))
}
