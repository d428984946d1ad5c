package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC/1.x) ingestion — the entry point a web-crawl
  * training pipeline actually starts from (Common-Crawl-style archives),
  * re-expressed Spark-first: file-level parallel `binaryFile` scan, then
  * a map-side byte-walk record parser (JDK-only, hand-rolled like the
  * [[graft.operators.Multimodal]] container kernels — no library
  * vendoring), exploding each archive into typed record rows the rest of
  * the curation surface consumes.
  *
  * Format handled: concatenated records, each
  * `WARC/1.x CRLF  header: value ...  CRLF CRLF  <Content-Length bytes>
  * CRLF CRLF`; header names case-insensitive; the payload of `response`
  * records may open with an HTTP/1.x status + headers block, which
  * [[httpBody]] strips at the first blank line. Gzip archives (including
  * the standard member-per-record form) are inflated up front —
  * `GZIPInputStream` consumes ALL members of a multi-member stream.
  *
  * Robustness contract (a crawl is hostile input): a malformed record —
  * bad magic, unparseable/absent Content-Length, a length past the
  * buffer end — ends parsing of THAT archive at that point and keeps
  * every record already parsed; it never throws into the task. Binary
  * payloads that themselves contain `WARC/1.0` text are safe: record
  * boundaries are walked by Content-Length, never by scanning for magic.
  *
  * Scale shape: one archive = one `binaryFile` row = one task — the
  * standard WARC layout (thousands of ~1 GB files) parallelizes at the
  * file level, and per-record work is map-side with zero shuffle.
  * Per-task memory is one inflated archive; gzip'd WARC is not
  * block-splittable (a property of the format, not this reader), so
  * archive SIZE, not count, is the memory knob.
  */
object Warc {

  /** One parsed record. `payload` is the raw Content-Length slice
    * (HTTP headers included for response records — see [[httpBody]]).
    */
  final case class WarcRecord(
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  /** Output schema of [[records]]: the per-record fields appended to the
    * caller's columns. Single source of truth for the IR validator.
    */
  val RecordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  private val Gzip = Array(0x1f.toByte, 0x8b.toByte)

  /** Inflate a (possibly multi-member) gzip buffer; non-gzip input passes
    * through. Corrupt gzip yields what inflated before the error —
    * consistent with the tolerant-parse contract.
    */
  /** Decompression bomb guard: a crawl archive legitimately inflates a
    * few × its compressed size; a hostile member claiming gigabytes from
    * kilobytes must not OOM the executor. Inflation stops at the cap and
    * the record walk processes the (truncated-total) prefix.
    */
  val MaxInflatedBytes: Long = 1L << 30

  private[sources] def inflate(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != Gzip(0) || bytes(1) != Gzip(1)) return bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size() <= MaxInflatedBytes) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  /** Parse the records of one (already inflated) archive buffer. Strict
    * on structure, total on input: the first malformed record stops the
    * walk, returning everything before it.
    */
  def parseRecords(raw: Array[Byte]): Seq[WarcRecord] = {
    val b = inflate(raw)
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      // skip inter-record CRLFs
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i >= b.length) ok = false
      else {
        val headerEnd = indexOfBlankLine(b, i)
        if (headerEnd < 0) ok = false
        else {
          val header = new String(b, i, headerEnd - i, java.nio.charset.StandardCharsets.UTF_8)
          val lines = header.split("\r\n")
          if (!lines.head.startsWith("WARC/")) ok = false
          else {
            val fields = lines.tail.flatMap { l =>
              val c = l.indexOf(':')
              if (c <= 0) None
              else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
            }.toMap
            fields.get("content-length").flatMap(s => s.toLongOption) match {
              // bounds stated as len <= remaining so a hostile
              // Content-Length near 2^63 cannot overflow the addition
              case Some(len) if len >= 0 && len <= b.length - headerEnd - 4L =>
                val start = headerEnd + 4 // past CRLF CRLF
                val payload = java.util.Arrays.copyOfRange(b, start, start + len.toInt)
                out += WarcRecord(
                  fields.getOrElse("warc-type", ""),
                  // the spec wraps the URI in <> in some writers; strip
                  fields.getOrElse("warc-target-uri", "")
                    .stripPrefix("<").stripSuffix(">"),
                  fields.getOrElse("warc-date", ""),
                  fields.getOrElse("content-type", ""),
                  len, payload)
                i = start + len.toInt
              case _ => ok = false // absent/bogus/truncating length
            }
          }
        }
      }
    }
    out.result()
  }

  /** First index of CRLF CRLF at or after `from`; -1 if absent. */
  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** The HTTP body of a response payload: everything past the first blank
    * line when the payload opens with an HTTP/1.x status line; the whole
    * payload otherwise (resource/conversion records carry bare content).
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
        !new String(payload, 0, 5, java.nio.charset.StandardCharsets.US_ASCII)
          .startsWith("HTTP/")) return payload
    val blank = indexOfBlankLine(payload, 0)
    if (blank < 0) payload
    else java.util.Arrays.copyOfRange(payload, blank + 4, payload.length)
  }

  /** Explode a frame of WARC archive buffers into record rows: the
    * caller's columns plus [[RecordSchema]]'s fields. Map-side
    * (iterator-to-iterator mapPartitions, no shuffle); a malformed
    * archive contributes the records parsed before the fault.
    */
  def records(df: DataFrame, binCol: String): DataFrame = {
    val schema = RecordSchema.fields.foldLeft(df.schema)(_ add _)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        if (bytes == null) Iterator.empty
        else parseRecords(bytes).iterator.map { rec =>
          Row.fromSeq(r.toSeq ++ Seq(rec.warc_type, rec.target_uri, rec.warc_date,
            rec.content_type, rec.content_length, rec.payload))
        }
      }
    }(enc)
  }

  /** Read a directory of `.warc` / `.warc.gz` archives into record rows
    * (path + modificationTime kept for provenance). File-level
    * parallelism; see the class note on archive size as the memory knob.
    */
  def readFiles(spark: SparkSession, path: String): DataFrame =
    records(
      spark.read.format("binaryFile").load(path)
        .select(col("path"), col("modificationTime"), col("content")),
      "content").drop("content")

  /** Streaming twin of [[readFiles]]: a landing directory of `.warc` /
    * `.warc.gz` archives consumed as a Structured Streaming source —
    * new archives are discovered per micro-batch (the standard
    * crawl-landing pattern), exploded through the same record parser.
    * Downstream, `responses` + a watermark on `warc_date` feed the
    * streaming dedup family ("dedup the crawl as it arrives" — spec
    * drives the composition).
    */
  def readStreamFiles(spark: SparkSession, path: String): DataFrame = {
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    records(
      spark.readStream.format("binaryFile").schema(binarySchema).load(path)
        .select(col("path"), col("modificationTime"), col("content")),
      "content").drop("content")
  }

  /** One ISO 28500 record per row as raw bytes — the serialization
    * inverse of the parser, pure Column algebra (header concat +
    * `Content-Length` from the payload's byte length, CRLF framing).
    * Feed to [[writeArchives]] to export a corpus as WARC shards.
    */
  def recordBytes(uri: Column, date: Column, payload: Column,
                  warcType: String = "resource"): Column = {
    val header = concat(
      lit(s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), length(payload).cast("string"),
      lit("\r\n\r\n"))
    concat(encode(header, "UTF-8"), payload, encode(lit("\r\n\r\n"), "UTF-8"))
  }

  /** Export record bytes ([[recordBytes]]) as one archive per partition
    * under `dir` (`part-NNNNN.warc[.gz]`) — the redistribution format a
    * curated corpus ships in. Writes happen executor-side through the
    * Hadoop FileSystem API (works on any configured scheme; the driver
    * sees only the model-sized list of written paths, which is also the
    * return value). Shard count/size is the caller's partitioning —
    * `repartition(n)` upstream for even shards. Empty partitions write
    * nothing. The gzip form is the whole-file member [[readFiles]]
    * inflates back.
    */
  def writeArchives(df: DataFrame, recordCol: String, dir: String,
                    gzip: Boolean = true): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val entries = df.sparkSession.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    val ext = if (gzip) ".warc.gz" else ".warc"
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

  /** Common Crawl's WET shape from decoded responses (the [[responses]]
    * frame): one `conversion` record per document carrying the
    * extracted text as its payload — the artifact most text pipelines
    * ingest instead of raw WARC. Column-only; pair with
    * [[writeArchives]] for `.warc.wet.gz` shards.
    */
  def toWet(responseFrame: DataFrame): DataFrame =
    responseFrame.select(recordBytes(col("target_uri"), col("warc_date"),
      encode(col("text"), "UTF-8"), "conversion").as("record"))

  /** Common Crawl's WAT shape from parsed records: one `metadata`
    * record per capture whose payload is the envelope JSON
    * (`url`, `date`, `content_type`, `length`). Column-only
    * (`to_json`); pair with [[writeArchives]] for `.warc.wat.gz`
    * shards.
    */
  def toWat(recordFrame: DataFrame): DataFrame =
    recordFrame
      // URI-less records (warcinfo) carry no capture to describe; the
      // parser surfaces an absent header as an empty string
      .filter(col("target_uri").isNotNull && length(col("target_uri")) > 0)
      .select(recordBytes(col("target_uri"), col("warc_date"),
        encode(to_json(struct(
          col("target_uri").as("url"), col("warc_date").as("date"),
          col("content_type"), col("content_length").as("length"))), "UTF-8"),
        "metadata").as("record"))

  /** Response records decoded to text documents: the bridge from a crawl
    * to the curation surface — HTTP headers stripped, body decoded UTF-8
    * (replacement chars on invalid sequences, total). Pure Column
    * algebra (decode + locate + substr), no scalar UDF. Columns:
    * (target_uri, warc_date, content_type, status, text) — `status` is
    * the embedded HTTP status code, null for bare payloads.
    */
  def responses(recordFrame: DataFrame): DataFrame = {
    // binary→string cast + make_valid_utf8 = replacement-decode: Spark
    // 4's decode(…,'UTF-8') THROWS on malformed bytes, and a crawl WILL
    // contain them — a poisoned payload must yield U+FFFD, not a dead task
    val t = make_valid_utf8(col("payload").cast(StringType))
    val sep = locate("\r\n\r\n", t)
    val body = when(t.startsWith("HTTP/") && sep > 0,
      t.substr(sep + lit(4), lit(Int.MaxValue))).otherwise(t)
    // HTTP status from the embedded status line (null for bare payloads)
    // — the standard keep-200s curation filter needs it
    val status = nullif(
      regexp_extract(t, "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit("")).cast("int")
    recordFrame.filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"), col("content_type"),
        status.as("status"), body.as("text"))
  }

  /** Charset a capture declares for its body: the `charset=` parameter
    * of a Content-Type value, else a `<meta charset=…>` /
    * `http-equiv` sniff over the first `sniffBytes` of the body
    * (viewed as latin1 — byte-transparent, so the sniff itself needs no
    * charset), else null. Lowercased label, not validated — pair with
    * [[decodeBody]] which maps labels to the decodable set.
    */
  def declaredCharset(contentType: Column, body: Column,
                      sniffBytes: Int = 2048): Column = {
    val fromHeader = lower(regexp_extract(coalesce(contentType, lit("")),
      "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_\\-]+)", 1))
    val prefix = decode(substring(body, 1, sniffBytes), "ISO-8859-1")
    val fromMeta = lower(regexp_extract(prefix,
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)", 1))
    when(length(fromHeader) > 0, fromHeader)
      .when(length(fromMeta) > 0, fromMeta)
      .otherwise(lit(null).cast(StringType))
  }

  /** Decode body bytes under a declared charset label, total on
    * hostile bytes (Spark 4's `decode` THROWS on malformed input — a
    * non-starter inside a 100 TB scan):
    *
    *  - latin1 family (`iso-8859-1`, `latin1`, the cp1252 labels):
    *    `decode(…, 'ISO-8859-1')` — every byte is valid latin1, so the
    *    throwing path is unreachable. cp1252 is approximated as latin1
    *    (byte-bijective: its 0x80–0x9F punctuation surfaces as C1
    *    codepoints instead of smart quotes — the documented trade for
    *    staying whole-stage-codegen).
    *  - UTF-16 variants: `decode` (the JVM UTF-16 decoders replace
    *    rather than report in practice; web UTF-16 is vanishingly rare).
    *  - everything else — `utf-8`, `us-ascii` (a UTF-8 subset), unknown
    *    labels, null: binary→string cast (bytes taken as-is, never
    *    throws) through `make_valid_utf8`, which rewrites invalid
    *    sequences to U+FFFD — replacement-decode semantics, codegen'd.
    */
  def decodeBody(body: Column, charset: Column): Column = {
    val cs = lower(coalesce(charset, lit("utf-8")))
    when(cs.isin("iso-8859-1", "iso8859-1", "latin1", "latin-1",
        "windows-1252", "cp1252", "x-cp1252"), decode(body, "ISO-8859-1"))
      .when(cs === "utf-16", decode(body, "UTF-16"))
      .when(cs === "utf-16be", decode(body, "UTF-16BE"))
      .when(cs === "utf-16le", decode(body, "UTF-16LE"))
      .otherwise(make_valid_utf8(body.cast(StringType)))
  }

  /** Charset-aware twin of [[responses]] for real-web corpora (where
    * roughly half of captures declare a non-UTF-8 body): the header
    * split runs on the byte-transparent latin1 view, the charset comes
    * from the embedded HTTP `Content-Type` header (falling back to the
    * WARC record's, then the meta sniff), and the body decodes under
    * [[decodeBody]]. Adds a `charset` column (the declared label, null
    * when nothing declared). Pure Column algebra — same zero-shuffle
    * map shape as [[responses]].
    */
  def responsesCharsetAware(recordFrame: DataFrame,
                            sniffBytes: Int = 2048): DataFrame = {
    val t1 = decode(col("payload"), "ISO-8859-1")
    val sep = locate("\r\n\r\n", t1)
    val hasHttp = t1.startsWith("HTTP/") && sep > 0
    val headers = when(hasHttp, t1.substr(lit(1), sep - 1)).otherwise(lit(""))
    val bodyBytes = when(hasHttp,
      col("payload").substr(sep + lit(4), length(col("payload"))))
      .otherwise(col("payload"))
    val httpCt = nullif(
      regexp_extract(headers, "(?i)content-type:\\s*([^\r\n]+)", 1), lit(""))
    val ct = coalesce(httpCt, col("content_type"))
    val cs = declaredCharset(ct, bodyBytes, sniffBytes)
    val status = nullif(
      regexp_extract(t1, "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit("")).cast("int")
    recordFrame.filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"), ct.as("content_type"),
        status.as("status"), cs.as("charset"),
        decodeBody(bodyBytes, cs).as("text"))
  }
}
