package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct.
  *
  * The IMAGE kernels are real, using only the JDK: dimensions are parsed
  * straight from container headers ([[imageDims]]: PNG IHDR, GIF screen
  * descriptor, JPEG SOFn scan, BMP info header — O(header), no pixel
  * decode), and resize/features decode pixels through `javax.imageio` +
  * `java.awt.image` (headless-safe: BufferedImage needs no display).
  * The AUDIO kernels are real for the dominant uncompressed container:
  * [[wavInfo]] walks the RIFF chunks (channels/rate/bits/duration),
  * [[pcmSamples]] decodes 8/16-bit PCM to normalized mono floats, and
  * [[audioRmsGrid]]/[[audioZcr]] compute loudness-envelope features and
  * zero-crossing rate from them. Payloads that are neither decodable
  * images nor PCM WAV (video containers, compressed audio, the synthetic
  * fixtures) fall back to the clearly-marked deterministic STUBs, so the
  * pipeline is total over mixed corpora — an mp3/H.264 codec binding
  * would slot into the same fallback chain.
  *
  * Everything Spark-side is real and tested either way: the schema, the
  * binary column handling, the `mapPartitions` batch shape (state per
  * partition, iterator-to-iterator so 100 TB of media streams through
  * without materializing a partition), and the partition sizing story
  * (media rows are wide, so plans should `repartitionByRange` on the id to
  * keep task inputs near `spark.sql.files.maxPartitionBytes`).
  */
object Multimodal {

  // ------------------------------------------------------------------
  // Real image kernels (JDK-only)
  // ------------------------------------------------------------------

  private def beU16(b: Array[Byte], i: Int): Int =
    (java.lang.Byte.toUnsignedInt(b(i)) << 8) | java.lang.Byte.toUnsignedInt(b(i + 1))
  private def leU16(b: Array[Byte], i: Int): Int =
    (java.lang.Byte.toUnsignedInt(b(i + 1)) << 8) | java.lang.Byte.toUnsignedInt(b(i))
  private def beI32(b: Array[Byte], i: Int): Int =
    (java.lang.Byte.toUnsignedInt(b(i)) << 24) | (java.lang.Byte.toUnsignedInt(b(i + 1)) << 16) |
      (java.lang.Byte.toUnsignedInt(b(i + 2)) << 8) | java.lang.Byte.toUnsignedInt(b(i + 3))
  private def leI32(b: Array[Byte], i: Int): Int =
    (java.lang.Byte.toUnsignedInt(b(i + 3)) << 24) | (java.lang.Byte.toUnsignedInt(b(i + 2)) << 16) |
      (java.lang.Byte.toUnsignedInt(b(i + 1)) << 8) | java.lang.Byte.toUnsignedInt(b(i))

  /** REAL image dimension parse, straight from the container bytes — no
    * pixel decode, no external codec:
    *
    *  - PNG: 8-byte signature, then IHDR width/height as BE i32 at 16/20.
    *  - GIF (87a/89a): logical screen w/h as LE u16 at 6/8.
    *  - BMP: `BM`, BITMAPINFOHEADER width/height as LE i32 at 18/22
    *    (|height| — a negative height means top-down row order).
    *  - JPEG: marker scan from SOI to the first SOFn frame header
    *    (C0-CF minus C4/C8/CC), height/width as BE u16 at +5/+7;
    *    standalone markers (TEM, RST0-7) carry no length field.
    *
    * Returns None for unrecognized or truncated payloads — the caller's
    * cue to fall back (stub, or a real audio/video probe).
    */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val b = bytes
    val n = if (b == null) 0 else b.length
    if (n >= 24 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)
      Some((beI32(b, 16), beI32(b, 20)))
    else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((leU16(b, 6), leU16(b, 8)))
    else if (n >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((leI32(b, 18), math.abs(leI32(b, 22))))
    else if (n >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 3 < n) {
        if ((b(i) & 0xFF) != 0xFF) return None // desynced: not a marker
        var m = b(i + 1) & 0xFF
        while (m == 0xFF && i + 2 < n) { i += 1; m = b(i + 1) & 0xFF } // fill bytes
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone
        else {
          if (i + 3 >= n) return None
          val len = beU16(b, i + 2)
          if (len < 2) return None
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (i + 8 >= n) return None
            return Some((beU16(b, i + 7), beU16(b, i + 5)))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** REAL image resize: `javax.imageio` decode → `Graphics2D` bilinear
    * resample to exactly w×h → PNG re-encode. Headless-safe (BufferedImage
    * rasters never touch a display). None when the payload is not a
    * decodable image — the stub-fallback cue.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

  /** Full pixel decode via ImageIO; None for non-images. The in-memory
    * stream avoids ImageIO's default disk-backed cache (a per-row temp
    * file would be an IO disaster inside a hot mapPartitions loop).
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else try {
      // no explicit close: ImageIO.read(ImageInputStream) closes the
      // stream itself per contract, and a second close throws
      // "IOException: closed" (and the backing stream is heap-only anyway)
      Option(javax.imageio.ImageIO.read(
        javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image features: `g × g` grid of mean luminance (ITU-R BT.601
    * luma, bilinear-resampled), the classic perceptual-feature base — a
    * g=8 grid is the input of aHash/pHash-family near-dup. Output length
    * g², row-major, each value in [0, 255]. None for non-images.
    */
  def lumaGrid(bytes: Array[Byte], g: Int): Option[Array[Float]] =
    resizeToRaster(bytes, g, g).map { img =>
      val out = new Array[Float](g * g)
      var y = 0
      while (y < g) {
        var x = 0
        while (x < g) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val gg = (rgb >> 8) & 0xFF; val bb = rgb & 0xFF
          out(y * g + x) = (0.299f * r + 0.587f * gg + 0.114f * bb)
          x += 1
        }
        y += 1
      }
      out
    }

  /** REAL perceptual hash (dHash): 9×8 luma grid, bit (y,x) set when
    * `luma(x,y) < luma(x+1,y)` — 64 bits of horizontal gradient signs.
    * Near-duplicate images differ in a few bits (hamming ≤ ~10), so the
    * output plugs directly into the SimHash banded near-dup machinery
    * (pigeonhole bands over a 64-bit signature). None for non-images.
    */
  def dHash(bytes: Array[Byte]): Option[Long] =
    resizeToRaster(bytes, 9, 8).map { img =>
      def luma(x: Int, y: Int): Float = {
        val rgb = img.getRGB(x, y)
        0.299f * ((rgb >> 16) & 0xFF) + 0.587f * ((rgb >> 8) & 0xFF) + 0.114f * (rgb & 0xFF)
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(x, y) < luma(x + 1, y)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

  private def resizeToRaster(bytes: Array[Byte], w: Int, h: Int): Option[java.awt.image.BufferedImage] =
    decodeImage(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

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
    * `mapPartitions` (the Scala analog of a vectorized batch UDF).
    * Recognized image containers get REAL dimensions from [[imageDims]]
    * (header parse only — no pixel decode in this pass) with
    * `duration_ms = 0` (still image); everything else falls back to the
    * deterministic stub, keeping the pass total over mixed corpora.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "payload", "media_type", "meta.n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val (w, h, d) = imageDims(bytes) match {
            case Some((iw, ih)) => (iw, ih, 0L) // still image: no duration
            case None => wavInfo(bytes) match {
              case Some(wi) => (0, 0, wi.durationMs) // audio: real duration
              case None => mp4Info(bytes) match {
                case Some(mi) => (mi.width, mi.height, mi.durationMs) // video: real facts
                case None     => decodeStub(bytes)
              }
            }
          }
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
    * Decodable images take the REAL `ImageIO` + bilinear path
    * ([[resizeImage]] — output is a w×h PNG); everything else the stub.
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
          val bytes = r.getAs[Array[Byte]]("payload")
          // O(header) magic-byte gate before the pixel decode: probing
          // every non-image payload through ImageIO would waste a reader
          // lookup + stream per row on mixed corpora
          val out = (if (imageDims(bytes).isDefined) resizeImage(bytes, w, h) else None)
            .getOrElse(resizeStub(bytes, w, h))
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

  /** Image feature extraction with the REAL kernel where possible: a
    * `grid × grid` mean-luminance vector ([[lumaGrid]]) for decodable
    * images — the aHash/pHash-family perceptual feature — and the
    * deterministic stub for everything else, so the pass stays total on a
    * mixed corpus. Output dim is grid², `Array[Float]`, ANN-compatible.
    * The O(header) [[imageDims]] gate runs before any pixel decode.
    */
  def imageFeatureExtract(media: DataFrame, grid: Int): DataFrame = {
    val dim = grid * grid
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("is_image", BooleanType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val real = if (imageDims(bytes).isDefined) lumaGrid(bytes, grid) else None
          Row(r.getLong(0), real.isDefined,
            real.getOrElse(featureStub(bytes, dim)).toSeq)
        }
      }(enc)
  }

  /** Perceptual hashes for the decodable images of a media frame:
    * `(media_id, dhash)` with the REAL 64-bit [[dHash]] — non-images are
    * dropped (a gradient-sign hash of arbitrary bytes would poison the
    * near-dup buckets with meaningless collisions). The output signature
    * column plugs into the same pigeonhole-banded hamming join the
    * SimHash near-dup path uses.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          (if (imageDims(bytes).isDefined) dHash(bytes) else None)
            .map(h => Row(r.getLong(0), h))
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // Real audio kernels (JDK-only): WAV/RIFF container + PCM math
  // ------------------------------------------------------------------

  /** Parsed WAV header facts (`fmt ` chunk + data size). */
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                           dataBytes: Long, durationMs: Long)

  /** REAL audio decode for the dominant uncompressed container: walk the
    * RIFF chunk list, read the `fmt ` chunk (PCM layout) and the `data`
    * chunk size, and derive duration as `dataBytes * 1000 / byteRate` —
    * O(header), no sample decode. None for non-WAV/truncated payloads
    * (the stub-fallback cue; compressed formats need a codec binding).
    */
  def wavInfo(bytes: Array[Byte]): Option[WavInfo] = {
    val b = bytes
    val n = if (b == null) 0 else b.length
    if (n < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    // the walk stays in Long arithmetic: chunk size is an UNSIGNED 32-bit
    // field, so a crafted/corrupted size >= 2^31 truncated to Int would
    // step zero or backwards — an infinite loop inside an executor task
    var i = 12L
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataBytes = -1L
    while (i + 8 <= n && (fmt.isEmpty || dataBytes < 0)) {
      val id = new String(b, i.toInt, 4, "US-ASCII")
      val size = leI32(b, i.toInt + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && i + 8 + 16 <= n) {
        val audioFormat = leU16(b, i.toInt + 8)
        if (audioFormat != 1) return None // PCM only; compressed WAV needs a codec
        fmt = Some((leU16(b, i.toInt + 10), leI32(b, i.toInt + 12), leU16(b, i.toInt + 22),
          leI32(b, i.toInt + 16).toLong & 0xFFFFFFFFL))
      } else if (id == "data") {
        // size may honestly exceed what we hold if the payload was cut;
        // clamp to the bytes actually present
        dataBytes = math.min(size, n - i - 8)
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned; bogus sizes exit the loop
    }
    for ((ch, rate, bits, byteRate) <- fmt
         // a malformed fmt chunk can declare 0 channels → div-by-zero in
         // pcmSamples; reject it here so every consumer stays total
         if ch >= 1 && dataBytes >= 0 && byteRate > 0)
      yield WavInfo(ch, rate, bits, dataBytes, dataBytes * 1000L / byteRate)
  }

  /** Decode 8/16-bit PCM WAV samples to normalized mono floats in [-1, 1]
    * (channels averaged). None for non-PCM-WAV payloads.
    */
  def pcmSamples(bytes: Array[Byte]): Option[Array[Float]] =
    wavInfo(bytes).flatMap { info =>
      if (info.bitsPerSample != 8 && info.bitsPerSample != 16) None
      else {
        // find the data chunk offset again (wavInfo only kept its size);
        // same Long-arithmetic walk as wavInfo — unsigned sizes never
        // truncate to a zero/negative Int step
        var i = 12L
        var off = -1
        while (i + 8 <= bytes.length && off < 0) {
          val id = new String(bytes, i.toInt, 4, "US-ASCII")
          val size = leI32(bytes, i.toInt + 4).toLong & 0xFFFFFFFFL
          if (id == "data") off = i.toInt + 8
          else i += 8L + size + (size & 1L)
        }
        if (off < 0) None
        else {
          val bytesPerSample = info.bitsPerSample / 8
          val frames = (info.dataBytes / (bytesPerSample * info.channels)).toInt
          val out = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var acc = 0.0f
            var c = 0
            while (c < info.channels) {
              val p = off + (f * info.channels + c) * bytesPerSample
              acc += (if (bytesPerSample == 1)
                (java.lang.Byte.toUnsignedInt(bytes(p)) - 128) / 128.0f // 8-bit is unsigned
              else // 16-bit signed little-endian
                ((bytes(p) & 0xFF) | (bytes(p + 1) << 8)).toShort / 32768.0f)
              c += 1
            }
            out(f) = acc / info.channels
            f += 1
          }
          Some(out)
        }
      }
    }

  /** REAL audio features: `dim` equal windows of RMS energy over the
    * normalized mono samples — the audio analog of [[lumaGrid]] (a coarse
    * loudness envelope; silence detection, energy-based near-dup, ANN).
    * Values in [0, 1]. None for non-PCM-WAV payloads.
    */
  def audioRmsGrid(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    pcmSamples(bytes).map { s =>
      val out = new Array[Float](dim)
      if (s.nonEmpty) {
        var w = 0
        while (w < dim) {
          val from = (s.length.toLong * w / dim).toInt
          val to = math.max((s.length.toLong * (w + 1) / dim).toInt, from + 1)
          var acc = 0.0
          var i = from
          while (i < math.min(to, s.length)) { acc += s(i) * s(i); i += 1 }
          val cnt = math.max(math.min(to, s.length) - from, 1)
          out(w) = math.sqrt(acc / cnt).toFloat
          w += 1
        }
      }
      out
    }

  /** Zero-crossing rate over the mono samples — crude but real
    * pitch/noisiness signal (sine ≈ 2f/rate, silence = 0, noise high).
    */
  def audioZcr(bytes: Array[Byte]): Option[Float] =
    pcmSamples(bytes).map { s =>
      if (s.length < 2) 0.0f
      else {
        var z = 0
        var i = 1
        while (i < s.length) {
          if ((s(i - 1) >= 0) != (s(i) >= 0)) z += 1
          i += 1
        }
        z.toFloat / (s.length - 1)
      }
    }

  /** Audio facts frame: REAL header numbers for PCM WAV payloads,
    * `is_audio = false` + zeros elsewhere (total on mixed corpora, same
    * contract as [[imageFeatureExtract]]).
    */
  def audioDecode(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("is_audio", BooleanType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("bits_per_sample", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          wavInfo(r.getAs[Array[Byte]]("payload")) match {
            case Some(w) => Row(r.getLong(0), true, w.channels, w.sampleRate,
              w.bitsPerSample, w.durationMs)
            case None => Row(r.getLong(0), false, 0, 0, 0, 0L)
          }
        }
      }(enc)
  }

  /** Audio feature extraction: REAL RMS-envelope grid for PCM WAV
    * payloads, deterministic stub for everything else — `dim` floats,
    * ANN-compatible, `is_audio` flags which kernel ran.
    */
  def audioFeatureExtract(media: DataFrame, dim: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("is_audio", BooleanType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val real = audioRmsGrid(bytes, dim)
          Row(r.getLong(0), real.isDefined,
            real.getOrElse(featureStub(bytes, dim)).toSeq)
        }
      }(enc)
  }

  /** Image near-duplicate pairs: REAL [[dHash]] perceptual signatures fed
    * through the same pigeonhole-banded hamming join as the text SimHash
    * path ([[Dedup.hammingNearDup]], 64-bit here) — candidates from
    * (band, bits) equi-joins, one shuffle, never all-pairs; exact
    * `bit_count(xor)` verification. Non-image payloads never enter the
    * index. Re-encoes/recompressions of the same picture land within a
    * few bits; `maxHamming` ≈ 6-10 is the usual near-dup budget.
    *
    * Output: (id1, id2, hamming), id1 < id2.
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 6,
                   cap: Dedup.BucketCap = Dedup.BucketCap.Auto()): DataFrame =
    imageNearDupAudited(media, maxHamming, cap)._1

  /** [[imageNearDup]] with the guard's [[Dedup.LshAudit]] attached —
    * the image-side mega-bucket is the all-zero dHash (black frames,
    * decode failures); the IR `media-near-dup` action writes the audit
    * to `audit-path`. Defaults to [[Dedup.BucketCap.Auto]] like the
    * rest of the banded family (r15; pre-r15 this face was unlimited).
    */
  def imageNearDupAudited(media: DataFrame, maxHamming: Int = 6,
                          cap: Dedup.BucketCap = Dedup.BucketCap.Auto()): (DataFrame, Option[Dedup.LshAudit]) =
    // materialize the signatures (the simhashNearDup convention): the
    // hamming kernel consumes its band table lazily on both self-join
    // sides, and the dHash decode+luma pipeline must not run twice
    Dedup.hammingNearDupAudited(Materialize(imageDHash(media)), "media_id", "dhash",
      sigBits = 64, maxHamming = maxHamming, cap = cap)

  // ------------------------------------------------------------------
  // REAL video kernel: ISO BMFF (MP4/MOV) box walk — O(moov), no codec.
  // ------------------------------------------------------------------

  private def beU32(b: Array[Byte], i: Int): Long = beI32(b, i) & 0xFFFFFFFFL
  private def beI64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Real MP4 facts, parsed from the container's box structure:
    * `ftyp` major brand, `mvhd` timescale/duration (both version 0 and 1
    * layouts), presentation width/height from the first video `tkhd`
    * (16.16 fixed point), per-handler track counts from `hdlr`, and the
    * total sample (frame) count from the `stts` tables.
    */
  final case class Mp4Info(brand: String, timescale: Long, durationMs: Long,
                           width: Int, height: Int, videoTracks: Int,
                           audioTracks: Int, nSamples: Long)

  /** ISO BMFF box walk: `[size u32][type 4cc]`, `size == 1` → 64-bit
    * largesize at +8, `size == 0` → extends to end. Containers
    * (`moov trak mdia minf stbl`) recurse; leaves read fixed layouts with
    * hard bounds checks. Strict on identity (payload must LEAD with
    * `ftyp` and contain `moov`+`mvhd`) so random bytes never parse;
    * tolerant inside (unknown boxes skipped, truncated leaves ignored) —
    * mirrors [[wavInfo]]'s refuse-don't-guess contract. Returns None on
    * anything else — the caller's stub-fallback cue.
    */
  def mp4Info(bytes: Array[Byte]): Option[Mp4Info] = {
    val b = bytes
    val n = if (b == null) 0 else b.length
    if (n < 16 || fourcc(b, 4) != "ftyp") return None
    val brand = fourcc(b, 8)

    var timescale = 0L; var duration = -1L
    var width = 0; var height = 0
    var videoTracks = 0; var audioTracks = 0; var nSamples = 0L
    var sawMvhd = false

    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(from: Long, to: Long): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size0 = beU32(b, i.toInt)
        val typ = fourcc(b, i.toInt + 4)
        var header = 8L
        val size: Long =
          if (size0 == 1L) {
            if (i + 16 > to) return
            header = 16L; beI64(b, i.toInt + 8)
          } else if (size0 == 0L) to - i
          else size0
        if (size < header || i + size > to) return // malformed: stop this level
        val p = (i + header).toInt // payload start
        val pLen = (size - header).toInt
        typ match {
          case t if containers(t) => walk(i + header, i + size)
          case "mvhd" if pLen >= 20 =>
            sawMvhd = true
            val v = b(p) & 0xFF
            if (v == 1 && pLen >= 32) {
              timescale = beU32(b, p + 20); duration = beI64(b, p + 24)
            } else {
              timescale = beU32(b, p + 12); duration = beU32(b, p + 16)
            }
          case "tkhd" =>
            val v = b(p) & 0xFF
            val (wo, ho) = if (v == 1) (88, 92) else (76, 80)
            if (pLen >= ho + 4) {
              val w = (beU32(b, p + wo) >> 16).toInt // 16.16 fixed
              val h = (beU32(b, p + ho) >> 16).toInt
              if (width == 0 && w > 0 && h > 0) { width = w; height = h }
            }
          case "hdlr" if pLen >= 12 =>
            fourcc(b, p + 8) match {
              case "vide" => videoTracks += 1
              case "soun" => audioTracks += 1
              case _      => ()
            }
          case "stts" if pLen >= 8 =>
            val entries = beU32(b, p + 4)
            var e = 0L
            while (e < entries && 8 + e * 8 + 8 <= pLen) {
              nSamples += beU32(b, p + 8 + (e * 8).toInt); e += 1
            }
          case _ => ()
        }
        i += size
      }
    }
    walk(0L, n.toLong)
    if (!sawMvhd || timescale <= 0) None
    else {
      // ISO 14496-12: an all-ones duration (0xFFFFFFFF v0 / -1 v1) is the
      // spec's "unknown" sentinel — surfacing it as a real duration would
      // make downstream frame sampling explode into billions of rows.
      // Any negative beI64 read is equally bogus; both map to 0 = unknown.
      val durMs =
        if (duration < 0 || duration == 0xFFFFFFFFL) 0L
        else duration * 1000L / timescale
      Some(Mp4Info(brand, timescale, durMs,
        width, height, videoTracks, audioTracks, nSamples))
    }
  }

  /** Video facts frame: REAL container numbers for MP4/MOV payloads,
    * `is_video = false` zero-rows for everything else (same shape as
    * [[audioDecode]]). Map-side `mapPartitions`, one pass.
    */
  def videoDecode(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("is_video", BooleanType, nullable = false),
      StructField("brand", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("video_tracks", IntegerType, nullable = false),
      StructField("audio_tracks", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          mp4Info(r.getAs[Array[Byte]]("payload")) match {
            case Some(m) => Row(r.getLong(0), true, m.brand, m.width, m.height,
              m.durationMs, m.videoTracks, m.audioTracks, m.nSamples)
            case None => Row(r.getLong(0), false, null, 0, 0, 0L, 0, 0, 0L)
          }
        }
      }(enc)
  }

  /** REAL frame-time sampling for parseable MP4s: `fps` uniform sample
    * timestamps across the container's true duration — one row per
    * sampled frame `(media_id, frame_no, t_ms)`. Payloads that are not
    * MP4 produce no rows (the byte-stride [[frameSample]] is the total
    * fallback). Map-side: parse + explode, no shuffle.
    */
  def videoFrameTimes(media: DataFrame, fps: Double,
                      maxFramesPerVideo: Long = 1000000L): DataFrame = {
    require(fps > 0, s"videoFrameTimes: fps must be > 0, got $fps")
    require(maxFramesPerVideo > 0,
      s"videoFrameTimes: maxFramesPerVideo must be > 0, got $maxFramesPerVideo")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("t_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val stepMs = math.max(1L, math.round(1000.0 / fps))
    media.select("media_id", "payload")
      .flatMap { r =>
        mp4Info(r.getAs[Array[Byte]]("payload")) match {
          case Some(m) if m.durationMs > 0 =>
            // lazy Iterator (never a strict per-row collection) AND a hard
            // frame cap: a bogus mvhd duration/timescale must not be able
            // to manufacture hundreds of millions of Rows from one payload
            val id = r.getLong(0)
            val nFrames = math.min(
              (m.durationMs + stepMs - 1) / stepMs,
              math.min(maxFramesPerVideo, Int.MaxValue.toLong))
            Iterator.range(0, nFrames.toInt)
              .map(i => Row(id, i.toLong, i * stepMs))
          case _ => Iterator.empty
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
