package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: stub-kernel laws and the fixture property the
  * DuckDB oracles depend on.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  test("resizeStub: bounded output, in-range stride positions, small inputs pass through") {
    val small = Array[Byte](1, 2, 3)
    assert(Multimodal.resizeStub(small, 16, 16).toSeq == small.toSeq) // n < w*h → identity
    val big = Array.tabulate(1000)(_.toByte)
    val out = Multimodal.resizeStub(big, 16, 16)
    assert(out.length == 256)
    assert(out.toSeq == (0 until 256).map(i => big(i * (1000 / 256))).toSeq)
    assert(Multimodal.resizeStub(Array.emptyByteArray, 16, 16).isEmpty)
    assert(Multimodal.resizeStub(null, 16, 16).isEmpty)
  }

  test("featureStub: fixed dim, unsigned bytes, empty input → zeros") {
    val b = Array[Byte](-1, 10) // -1 = 0xff = 255 unsigned
    val f = Multimodal.featureStub(b, 4)
    assert(f.length == 4)
    assert(f(0) == 255.0f) // (0*31) % 2 = 0 → byte 0 unsigned
    assert(f(1) == 10.0f)  // (1*31) % 2 = 1 → byte 1
    assert(Multimodal.featureStub(Array.emptyByteArray, 3).toSeq == Seq(0.0f, 0.0f, 0.0f))
  }

  // ---- real-image kernels: fixtures generated in-test via ImageIO ----

  /** A w×h RGB image with a deterministic two-tone gradient, encoded in
    * `fmt` ("png" | "gif" | "jpg" | "bmp").
    */
  private def makeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) 30 else 220 // left dark, right bright
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no JDK writer for $fmt")
    baos.toByteArray
  }

  test("imageDims parses real PNG/GIF/JPEG/BMP headers; garbage and truncation → None") {
    for (fmt <- Seq("png", "gif", "jpg", "bmp")) {
      val bytes = makeImage(37, 23, fmt)
      assert(Multimodal.imageDims(bytes).contains((37, 23)), s"fmt=$fmt")
      // truncating the header kills the parse, not the process
      assert(Multimodal.imageDims(bytes.take(8)).isEmpty || fmt == "gif" || fmt == "bmp")
    }
    assert(Multimodal.imageDims("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.imageDims(null).isEmpty)
  }

  test("decode() reports real dimensions for image payloads, stub elsewhere") {
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, makeImage(64, 48, "png"), "image", "t"),
      (2L, "not an image at all".getBytes("UTF-8"), "audio", "t"))
      .toDF("media_id", "payload", "media_type", "src")
      .select(col("media_id"), col("payload"), col("media_type"),
        struct(length(col("payload")).cast("long").as("n_bytes"),
          col("src").as("source")).as("meta"))
    val out = Multimodal.decode(media).orderBy("media_id").collect()
    assert(out(0).getInt(3) == 64 && out(0).getInt(4) == 48 && out(0).getLong(5) == 0L)
    val (sw, sh, sd) = Multimodal.decodeStub("not an image at all".getBytes("UTF-8"))
    assert(out(1).getInt(3) == sw && out(1).getInt(4) == sh && out(1).getLong(5) == sd)
  }

  test("resize() really resamples image payloads: output is a decodable w×h PNG") {
    val s = spark
    import s.implicits._
    val media = Seq((1L, makeImage(64, 48, "jpg"), "image"),
      (2L, "plain text".getBytes("UTF-8"), "audio"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.resize(media, 16, 12).orderBy("media_id").collect()
    val resized = out(0).getAs[Array[Byte]]("payload")
    assert(Multimodal.imageDims(resized).contains((16, 12))) // real PNG out
    val img = Multimodal.decodeImage(resized).get
    // the two-tone gradient survives the bilinear resample: left darker
    def lum(x: Int) = (0 until 12).map(y => img.getRGB(x, y) & 0xFF).sum / 12.0
    assert(lum(1) < 100 && lum(14) > 150, s"left ${lum(1)} right ${lum(14)}")
    // non-image fell back to the stub
    assert(out(1).getAs[Array[Byte]]("payload").toSeq ==
      Multimodal.resizeStub("plain text".getBytes("UTF-8"), 16, 12).toSeq)
  }

  test("lumaGrid + dHash: real perceptual features; near-dups close, distinct images far") {
    val base = makeImage(64, 48, "png")
    val grid = Multimodal.lumaGrid(base, 8).get
    assert(grid.length == 64 && grid.forall(v => v >= 0 && v <= 255))
    // left-dark / right-bright survives into the luma grid
    assert(grid(0) < 100 && grid(7) > 150)
    val h1 = Multimodal.dHash(base).get
    // near-duplicate: same gradient re-encoded lossily (jpg) — tiny hamming
    val h2 = Multimodal.dHash(makeImage(64, 48, "jpg")).get
    // a very different image: inverted gradient
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = if (x < 32) 220 else 30
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val h3 = Multimodal.dHash(inv).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) <= 6, s"near-dup hamming ${ham(h1, h2)}")
    // mirrored two-tone flips exactly 2 gradient bits per row → 16
    assert(ham(h1, h3) >= 16, s"distinct hamming ${ham(h1, h3)}")
    assert(Multimodal.dHash("some text".getBytes("UTF-8")).isEmpty)
  }

  test("imageFeatureExtract and imageDHash frames: real for images, total on mixed corpora") {
    val s = spark
    import s.implicits._
    val media = Seq((1L, makeImage(40, 40, "png")), (2L, "audio bytes here".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val feats = Multimodal.imageFeatureExtract(media, 8).orderBy("media_id").collect()
    assert(feats(0).getBoolean(1) && feats(1).getBoolean(1) == false)
    assert(feats.forall(_.getSeq[Float](2).length == 64))
    val hashes = Multimodal.imageDHash(media).collect()
    assert(hashes.length == 1 && hashes.head.getLong(0) == 1L) // non-image dropped
  }

  test("media-image-features and media-dhash are declarable as IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val media = Seq((1L, makeImage(32, 32, "png")), (2L, "audio".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val feats = Engine.run(
      Node.fromJson("""{"action":"media-image-features","params":[{"grid":4}],
        |"children":[{"action":"tap","params":["f"]}]}""".stripMargin),
      media, EngineCtx(testMode = true)).taps("f")
    assert(feats.count() == 2 && feats.columns.contains("is_image"))
    val hashes = Engine.run(
      Node.fromJson("""{"action":"media-dhash","params":[],
        |"children":[{"action":"tap","params":["h"]}]}""".stripMargin),
      media, EngineCtx(testMode = true)).taps("h")
    assert(hashes.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("imageNearDup: re-encoded image pairs up, distinct image does not, non-images ignored") {
    val s = spark
    import s.implicits._
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = if (x < 32) 220 else 30
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      (1L, makeImage(64, 48, "png")), // base
      (2L, makeImage(64, 48, "jpg")), // lossy re-encode of the same picture
      (3L, inv),                      // mirrored two-tone: far away
      (4L, "definitely not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDup(media, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("IR media-near-dup audit-path: the dHash mega-bucket's exemption lands as parquet") {
    val s = spark
    import s.implicits._
    // 40 identical solid-black frames — ONE degenerate dHash bucket per
    // band — plus the organic re-encode pair from the test above
    def black(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = ((100L until 140L).map(i => (i, black())) ++ Seq(
      (1L, makeImage(64, 48, "png")), (2L, makeImage(64, 48, "jpg"))))
      .toDF("media_id", "payload")
    val auditPath = s"${java.nio.file.Files.createTempDirectory("graft-media-audit")}/audit"
    val node = graft.ir.Node.fromJson(
      s"""{"action":"media-near-dup",
         | "params":[{"max-hamming":6,"max-bucket":8,"audit-path":"$auditPath"}],
         | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
    val pairs = graft.ir.Engine.run(node, media,
        graft.ir.EngineCtx(testMode = true)).taps("out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the black clique's buckets are dropped from the pair list; the
    // organic pair survives
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    val audit = spark.read.parquet(auditPath).collect()
    assert(audit.length == 1)
    assert(audit.head.getAs[Long]("excluded_buckets") > 0L)
    assert(audit.head.getAs[Long]("excluded_members") >= 40L)
  }

  // ---- real-audio kernels: WAV fixtures built byte-by-byte in-test ----

  /** Mono 16-bit PCM WAV: first half a `freq` Hz sine at ~0.92 amplitude,
    * second half silence.
    */
  private def makeWav(seconds: Double = 0.5, rate: Int = 8000, freq: Double = 440): Array[Byte] = {
    val frames = (seconds * rate).toInt
    val samples = Array.tabulate(frames) { i =>
      if (i < frames / 2) (math.sin(2 * math.Pi * freq * i / rate) * 30000).toShort
      else 0.toShort
    }
    val dataBytes = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes); bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("wavInfo parses a real RIFF/PCM header; compressed/garbage/truncated → None") {
    val wav = makeWav(0.5, 8000)
    val info = Multimodal.wavInfo(wav).get
    assert(info.channels == 1 && info.sampleRate == 8000 && info.bitsPerSample == 16)
    assert(info.dataBytes == 8000L && info.durationMs == 500L)
    assert(Multimodal.wavInfo("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.wavInfo(wav.take(20)).isEmpty)
    // non-PCM format code (e.g. 85 = mp3-in-wav) refuses rather than lies
    val mp3ish = wav.clone(); mp3ish(20) = 85
    assert(Multimodal.wavInfo(mp3ish).isEmpty)
  }

  test("pcmSamples / audioRmsGrid / audioZcr compute real signal numbers") {
    val wav = makeWav(0.5, 8000, freq = 440)
    val s = Multimodal.pcmSamples(wav).get
    assert(s.length == 4000)
    assert(math.abs(s.take(2000).map(v => math.abs(v)).max - 30000 / 32768.0) < 0.01)
    assert(s.drop(2000).forall(_ == 0.0f))
    val rms = Multimodal.audioRmsGrid(wav, 4).get
    // sine RMS = amplitude/sqrt(2) ≈ 0.647 in the loud half, 0 in silence
    assert(rms(0) > 0.6 && rms(1) > 0.6 && rms(2) < 0.001 && rms(3) < 0.001,
      rms.mkString(","))
    // ZCR of a 440 Hz sine at 8 kHz ≈ 2*440/8000 = 0.11 over the loud
    // half → ≈ 0.055 overall (silence contributes no crossings)
    val zcr = Multimodal.audioZcr(wav).get
    assert(zcr > 0.04 && zcr < 0.07, s"zcr $zcr")
  }

  test("decode() reports real WAV duration; audioDecode/audioFeatureExtract total on mixed corpora") {
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, makeWav(0.5, 8000), "audio", "t"),
      (2L, makeImage(32, 16, "png"), "image", "t"),
      (3L, "neither".getBytes("UTF-8"), "video", "t"))
      .toDF("media_id", "payload", "media_type", "src")
      .select(col("media_id"), col("payload"), col("media_type"),
        struct(length(col("payload")).cast("long").as("n_bytes"),
          col("src").as("source")).as("meta"))
    val dec = Multimodal.decode(media).orderBy("media_id").collect()
    assert(dec(0).getInt(3) == 0 && dec(0).getInt(4) == 0 && dec(0).getLong(5) == 500L)
    assert(dec(1).getInt(3) == 32 && dec(1).getInt(4) == 16)
    val au = Multimodal.audioDecode(media).orderBy("media_id").collect()
    assert(au(0).getBoolean(1) && au(0).getInt(2) == 1 && au(0).getInt(3) == 8000 &&
      au(0).getLong(5) == 500L)
    assert(!au(1).getBoolean(1) && !au(2).getBoolean(1))
    val feats = Multimodal.audioFeatureExtract(media, 8).orderBy("media_id").collect()
    assert(feats(0).getBoolean(1) && !feats(1).getBoolean(1))
    assert(feats.forall(_.getSeq[Float](2).length == 8))
  }

  test("documents fixture is pure ASCII (byte positions == char positions, oracle precondition)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val bad = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(bad == 0, s"$sf has non-ASCII documents; media oracles would diverge")
    }
  }

  test("media ops are declarable as an IR pipeline (decode-free media stage chain)") {
    import graft.ir.{Engine, EngineCtx, Node}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesize(docs, "doc_id", "text", "source")
    val node = Node.fromJson(
      """{"action":"media-resize","params":[{"width":8,"height":8}],"children":[
        |  {"action":"media-features","params":[{"dim":4}],"children":[
        |    {"action":"tap","params":["feats"]}]}]}""".stripMargin)
    val out = Engine.run(node, media, EngineCtx(testMode = true)).taps("feats")
    assert(out.columns.toSeq == Seq("media_id", "features"))
    assert(out.count() == docs.count())
    // features come from the RESIZED payload: dim 4, byte at (j*31) mod n_out
    val row = out.orderBy("media_id").head
    assert(row.getSeq[Float](1).length == 4)
  }

  test("featureExtract output feeds the similarity operators (Array[Float] contract)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesize(docs, "doc_id", "text", "source")
    val feats = Multimodal.featureExtract(media, 8)
      .withColumnRenamed("media_id", "vec_id").withColumnRenamed("features", "embedding")
    // brute-force ANN accepts the extracted features directly
    val knn = graft.operators.Similarity.bruteForceTopK(
      feats, feats.limit(3), "vec_id", "embedding", 2)
    assert(knn.count() == 6) // 3 queries × top-2
  }

  // ---- real MP4 fixtures: boxes built byte-by-byte ----
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length); bb.put(typ.getBytes("US-ASCII")); bb.put(body)
    bb.array()
  }
  private def be32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def fix1616(v: Int): Array[Byte] = be32(v.toLong << 16)

  /** Minimal valid MP4: ftyp(isom) + moov(mvhd + video trak(tkhd, hdlr
    * vide, stts) + audio trak(hdlr soun)). timescale 600, duration 3000
    * units = 5 s; 150 frames of 20 units.
    */
  private def makeMp4(v1: Boolean = false): Array[Byte] = {
    val mvhd =
      if (v1) box("mvhd", Array[Byte](1, 0, 0, 0), new Array[Byte](16),
        be32(600), Array.fill[Byte](4)(0), be32(3000))
      else box("mvhd", new Array[Byte](12), be32(600), be32(3000))
    val tkhd = box("tkhd", new Array[Byte](76), fix1616(640), fix1616(360))
    val hdlrV = box("hdlr", new Array[Byte](8), "vide".getBytes("US-ASCII"))
    val hdlrA = box("hdlr", new Array[Byte](8), "soun".getBytes("US-ASCII"))
    val stts = box("stts", new Array[Byte](4), be32(1), be32(150), be32(20))
    val trakV = box("trak", tkhd,
      box("mdia", hdlrV, box("minf", box("stbl", stts))))
    val trakA = box("trak", box("mdia", hdlrA))
    box("ftyp", "isom".getBytes("US-ASCII"), be32(512)) ++
      box("moov", mvhd, trakV, trakA)
  }

  test("mp4Info parses real ISO BMFF boxes (v0+v1 mvhd); garbage/truncation/no-moov → None") {
    for (v1 <- Seq(false, true)) {
      val m = Multimodal.mp4Info(makeMp4(v1)).get
      assert(m.brand == "isom" && m.timescale == 600L && m.durationMs == 5000L)
      assert(m.width == 640 && m.height == 360)
      assert(m.videoTracks == 1 && m.audioTracks == 1 && m.nSamples == 150L)
    }
    assert(Multimodal.mp4Info("not a video at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.mp4Info(makeMp4().take(40)).isEmpty)          // moov cut off
    assert(Multimodal.mp4Info(box("ftyp", "isom".getBytes("US-ASCII"))).isEmpty) // no moov
    assert(Multimodal.mp4Info(null).isEmpty)
  }

  test("videoDecode / decode() / videoFrameTimes: real MP4 numbers, total on mixed corpora") {
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, makeMp4(), "video", "t"),
      (2L, makeWav(0.5, 8000), "audio", "t"),
      (3L, "neither".getBytes("UTF-8"), "video", "t"))
      .toDF("media_id", "payload", "media_type", "src")
      .select(col("media_id"), col("payload"), col("media_type"),
        struct(length(col("payload")).cast("long").as("n_bytes"),
          col("src").as("source")).as("meta"))
    val vd = Multimodal.videoDecode(media).orderBy("media_id").collect()
    assert(vd(0).getBoolean(1) && vd(0).getString(2) == "isom" &&
      vd(0).getInt(3) == 640 && vd(0).getInt(4) == 360 &&
      vd(0).getLong(5) == 5000L && vd(0).getLong(8) == 150L)
    assert(!vd(1).getBoolean(1) && !vd(2).getBoolean(1))
    // decode() routes MP4s through the real parser
    val dec = Multimodal.decode(media).orderBy("media_id").collect()
    assert(dec(0).getInt(3) == 640 && dec(0).getInt(4) == 360 && dec(0).getLong(5) == 5000L)
    // 2 fps over 5 s → 10 frames at 0,500,...,4500 ms; non-MP4s emit none
    val ft = Multimodal.videoFrameTimes(media, 2.0).orderBy("media_id", "frame_no").collect()
    assert(ft.length == 10 && ft.forall(_.getLong(0) == 1L))
    assert(ft.map(_.getLong(2)).toSeq == (0L until 5000L by 500L).toSeq)
    // IR declarability
    import graft.ir.{Engine, EngineCtx, Node}
    val irOut = Engine.run(Node.fromJson(
      """{"action":"media-video-decode","params":[],"children":[
        |  {"action":"tap","params":["v"]}]}""".stripMargin),
      media, EngineCtx(testMode = true)).taps("v")
    assert(irOut.filter(col("is_video")).count() == 1)
  }
}
