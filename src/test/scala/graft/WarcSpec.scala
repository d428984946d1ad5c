package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingestion kernels: byte-built archives (like MultimodalSpec's
  * container fixtures) through the record walk, gzip inflation, HTTP
  * body split, and the DataFrame faces. The build→parse round trip is
  * oracle-gated (`warc_roundtrip`).
  */
class WarcSpec extends AnyFunSuite {
  import TestSpark.spark

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  private def rec(tpe: String, uri: String, payload: Array[Byte],
                  extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $tpe\r\n")
    if (uri.nonEmpty) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    extra.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
    h.append(s"Content-Length: ${payload.length}\r\n\r\n")
    h.toString.getBytes(UTF8) ++ payload ++ "\r\n\r\n".getBytes(UTF8)
  }

  private val httpPayload =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>hello crawl</html>").getBytes(UTF8)

  private def archive(): Array[Byte] =
    rec("warcinfo", "", "software: test\r\n".getBytes(UTF8)) ++
    rec("response", "http://example.com/a", httpPayload,
      Seq("Content-Type" -> "application/http; msgtype=response")) ++
    rec("request", "http://example.com/a", "GET /a HTTP/1.1\r\n".getBytes(UTF8))

  test("parseRecords: fields, exact payloads, Content-Length boundaries") {
    val rs = Warc.parseRecords(archive())
    assert(rs.map(_.warc_type) == Seq("warcinfo", "response", "request"))
    val resp = rs(1)
    assert(resp.target_uri == "http://example.com/a")
    assert(resp.warc_date == "2024-01-01T00:00:00Z")
    assert(resp.content_length == httpPayload.length.toLong)
    assert(resp.payload.sameElements(httpPayload))
  }

  test("binary payload containing 'WARC/1.0' text does not break boundaries") {
    val tricky = "fake\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF8)
    val rs = Warc.parseRecords(
      rec("resource", "http://x/1", tricky) ++ rec("resource", "http://x/2", "b".getBytes(UTF8)))
    assert(rs.map(_.target_uri) == Seq("http://x/1", "http://x/2"))
    assert(rs.head.payload.sameElements(tricky))
  }

  test("malformed input is total: prefix kept, no throw") {
    val good = rec("resource", "http://x/1", "abc".getBytes(UTF8))
    // truncated second record (length past buffer)
    val bad = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 9999\r\n\r\nxx".getBytes(UTF8)
    assert(Warc.parseRecords(good ++ bad).map(_.target_uri) == Seq("http://x/1"))
    // bogus/absent length, bad magic, garbage, empty
    assert(Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF8)).isEmpty)
    assert(Warc.parseRecords("WARC/1.0\r\nContent-Length: nope\r\n\r\n".getBytes(UTF8)).isEmpty)
    // hostile Content-Length near 2^63 must not overflow the bounds math
    assert(Warc.parseRecords(
      ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: " +
        Long.MaxValue + "\r\n\r\nx").getBytes(UTF8)).isEmpty)
    assert(Warc.parseRecords(Array.fill[Byte](64)(7)).isEmpty)
    assert(Warc.parseRecords(Array.emptyByteArray).isEmpty)
    // uri <> wrapping stripped
    val wrapped = Warc.parseRecords(rec("response", "<http://w/1>", "x".getBytes(UTF8)))
    assert(wrapped.head.target_uri == "http://w/1")
  }

  test("deterministic fuzz: mutated archives always return a Seq — no throw, no hang") {
    // parseRecords' contract is TOTAL (garbage yields fewer/no records,
    // never an exception — a crawl of hostile bytes must not fail
    // tasks): flip/truncate/splice valid plain AND gzipped archives
    // under a fixed seed and hold the contract, including that any
    // records that DO survive carry sane bounded payloads
    val base = rec("response", "http://f/1", "hello world".getBytes(UTF8)) ++
      rec("resource", "http://f/2", Array.fill[Byte](64)(42))
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(base); g.close(); bos.toByteArray
    }
    val rnd = new scala.util.Random(99)
    def mutants(b0: Array[Byte]): Iterator[Array[Byte]] = Iterator.tabulate(250) { _ =>
      val b = b0.clone()
      rnd.nextInt(3) match {
        case 0 => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
        case 1 => b.take(rnd.nextInt(b.length))
        case 2 =>
          val at = rnd.nextInt(b.length)
          b.take(at) ++ Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(256).toByte) ++ b.drop(at)
      }
    }
    for (seed <- Seq(base, gz); (m, i) <- mutants(seed).zipWithIndex) {
      val out =
        try Warc.parseRecords(m)
        catch { case e: Throwable =>
          fail(s"mutant $i (${seed.length}B seed): threw ${e.getClass.getName}: ${e.getMessage}") }
      out.foreach { r =>
        assert(r.payload.length <= m.length,
          s"mutant $i: record payload larger than its input") }
    }
  }

  test("gzip: whole-archive and member-per-record forms parse identically") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val plain = Warc.parseRecords(archive()).map(r => (r.warc_type, r.content_length))
    assert(Warc.parseRecords(gz(archive())).map(r => (r.warc_type, r.content_length)) == plain)
    val perRecord =
      gz(rec("warcinfo", "", "software: test\r\n".getBytes(UTF8))) ++
      gz(rec("response", "http://example.com/a", httpPayload,
        Seq("Content-Type" -> "application/http; msgtype=response"))) ++
      gz(rec("request", "http://example.com/a", "GET /a HTTP/1.1\r\n".getBytes(UTF8)))
    assert(Warc.parseRecords(perRecord).map(r => (r.warc_type, r.content_length)) == plain)
  }

  test("httpBody: strips status+headers, passes bare content through") {
    assert(new String(Warc.httpBody(httpPayload), UTF8) == "<html>hello crawl</html>")
    val bare = "just text".getBytes(UTF8)
    assert(Warc.httpBody(bare).sameElements(bare))
    val noBlank = "HTTP/1.1 200 OK\r\nContent-Type: text".getBytes(UTF8)
    assert(Warc.httpBody(noBlank).sameElements(noBlank))
  }

  test("records + responses DataFrame faces: explode, filter, header strip") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, archive()), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("file_id", "bytes")
    val recs = Warc.records(df, "bytes")
    assert(recs.count() == 3L) // null archive row contributes nothing
    assert(recs.columns.take(2).toSeq == Seq("file_id", "bytes"))
    val resp = Warc.responses(recs).collect()
    assert(resp.length == 1)
    assert(resp.head.getAs[String]("text") == "<html>hello crawl</html>")
    assert(resp.head.getAs[String]("target_uri") == "http://example.com/a")
    assert(resp.head.getAs[Int]("status") == 200)
    // bare (resource-style) payload masquerading as a response: no HTTP
    // status line -> null status, text passes through whole
    val bare = Warc.responses(Warc.records(
      Seq((9L, rec("response", "http://x/bare", "no headers here".getBytes(UTF8))))
        .toDF("file_id", "bytes"), "bytes")).collect().head
    assert(bare.isNullAt(bare.fieldIndex("status")))
    assert(bare.getAs[String]("text") == "no headers here")
  }

  test("warc-records / warc-responses are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val df = Seq((1L, archive())).toDF("file_id", "bytes")
    val out = Engine.run(Node.fromJson(
      """{"action":"warc-records","params":[{"bin":"bytes"}],
        | "children":[{"action":"warc-responses",
        |              "children":[{"action":"tap","params":["out"]}]}]}""".stripMargin),
      df, EngineCtx(testMode = true)).taps("out")
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("text") == "<html>hello crawl</html>")
  }

  test("streaming crawl ingest: landed archives -> record stream -> watermarked dedup") {
    val s = spark
    import s.implicits._
    val land = java.nio.file.Files.createTempDirectory("warc_land")
    try {
      def respAt(uri: String, date: String, body: String) = {
        val payload = ("HTTP/1.1 200 OK\r\n\r\n" + body).getBytes(UTF8)
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
          s"WARC-Date: $date\r\nContent-Length: ${payload.length}\r\n\r\n").getBytes(UTF8) ++
          payload ++ "\r\n\r\n".getBytes(UTF8)
      }
      // batch 1: two docs, one duplicated text; batch 2: the same text
      // AGAIN from another uri (in-horizon -> deduped) + a closer
      java.nio.file.Files.write(land.resolve("b1.warc"),
        respAt("http://a/", "2024-01-01T00:00:01Z", "same text") ++
        respAt("http://b/", "2024-01-01T00:00:02Z", "other text"))
      val stream = graft.sources.Warc.readStreamFiles(s, land.toString)
      assert(stream.isStreaming)
      val deduped = graft.sources.Warc.responses(stream)
        .withColumn("__ts", to_timestamp(col("warc_date")))
        .withWatermark("__ts", "10 minutes")
        .dropDuplicatesWithinWatermark("text")
      val q = deduped.writeStream.format("memory").queryName("warc_stream")
        .outputMode("append").start()
      q.processAllAvailable()
      java.nio.file.Files.write(land.resolve("b2.warc"),
        respAt("http://c/", "2024-01-01T00:00:03Z", "same text") ++
        respAt("http://d/", "2024-01-01T00:00:04Z", "fresh text"))
      q.processAllAvailable(); q.stop()
      val kept = s.table("warc_stream").select("target_uri", "text").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // 'same text' from http://c/ arrived within the horizon -> dropped
      assert(kept.map(_._2) == Set("same text", "other text", "fresh text"))
      assert(!kept.exists(_._1 == "http://c/"), kept.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(land).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("end-to-end: declared IR chain from crawl bytes to a deduped corpus") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    def resp(uri: String, status: String, body: String) =
      rec("response", uri,
        (s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n" + body).getBytes(UTF8))
    // built from code points so composed-vs-decomposed is unambiguous
    val composed = "caf" + new String(Character.toChars(0xE9)) + " menu today"
    val decomposed = "cafe" + new String(Character.toChars(0x301)) + " menu today"
    assert(composed != decomposed) // distinct bytes BEFORE normalization
    val crawl =
      resp("http://a/", "200 OK", composed) ++
      resp("http://b/", "200 OK", decomposed) ++ // same text after NFC
      resp("http://c/", "404 Not Found", "not found") ++
      rec("request", "http://a/", "GET / HTTP/1.1\r\n".getBytes(UTF8)) ++
      resp("http://d/", "200 OK", "something else entirely")
    val df = Seq((1L, crawl)).toDF("file_id", "bytes")
    val chain = Node.fromJson(
      """{"action":"warc-records","params":[{"bin":"bytes"}],"children":[
        | {"action":"warc-responses","children":[
        |  {"action":"where","params":[["=","status",200]],"children":[
        |   {"action":"unicode-normalize","params":[{"field":"text","out":"norm"}],"children":[
        |    {"action":"dedup-exact","params":["norm","target_uri"],"children":[
        |     {"action":"tap","params":["out"]}]}]}]}]}]}""".stripMargin)
    val out = Engine.run(chain, df, EngineCtx(testMode = true)).taps("out")
      .select("target_uri", "norm").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // 404 and the request record are gone; a/b collapse to ONE row
    // because NFC makes their texts byte-equal — the reason unicode
    // normalization must run BEFORE exact dedup
    assert(out.map(_._1).toSeq == Seq("http://a/", "http://d/"), out.toSeq.toString)
    assert(out.head._2 == composed) // normalized to the composed form
  }

  test("writeArchives: corpus -> .warc.gz shards -> readFiles round trip") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_out")
    try {
      val docsDf = Seq(
        ("http://a/", "alpha doc"), ("http://b/", "beta doc"),
        ("http://c/", "gamma doc")).toDF("uri", "text")
        .repartition(2)
      val recs = docsDf.withColumn("rec", graft.sources.Warc.recordBytes(
        col("uri"), lit("2024-01-01T00:00:00Z"), encode(col("text"), "UTF-8")))
      val written = graft.sources.Warc.writeArchives(recs, "rec", dir.toString)
      assert(written.nonEmpty && written.forall(_.endsWith(".warc.gz")))
      val back = graft.sources.Warc.readFiles(s, dir.toString)
        .select("target_uri", "payload").collect()
        .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF8)))
        .sortBy(_._1)
      assert(back.toSeq == Seq(
        "http://a/" -> "alpha doc", "http://b/" -> "beta doc",
        "http://c/" -> "gamma doc"))
      // uncompressed form too
      val dir2 = java.nio.file.Files.createTempDirectory("warc_out2")
      try {
        val w2 = graft.sources.Warc.writeArchives(recs, "rec", dir2.toString,
          gzip = false)
        assert(w2.forall(_.endsWith(".warc")))
        assert(graft.sources.Warc.readFiles(s, dir2.toString).count() == 3)
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir2).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("output-warc: io-gated IR sink exporting archives") {
    import graft.ir.{Engine, EngineCtx, Node}
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_sink")
    try {
      val df = Seq(("http://x/1", "payload one")).toDF("uri", "text")
        .withColumn("date", lit("2024-01-01T00:00:00Z"))
        .withColumn("body", encode(col("text"), "UTF-8"))
      val node = Node.fromJson(
        s"""{"action":"output-warc",
           | "params":[{"path":"$dir","uri":"uri","date":"date","payload":"body"}],
           | "children":[{"action":"tap","params":["out"]}]}""".stripMargin)
      // test mode: suppressed, nothing written
      Engine.run(node, df, EngineCtx(testMode = true))
      assert(!java.nio.file.Files.list(dir).iterator().hasNext)
      // live: archives appear and parse back
      Engine.run(node, df, EngineCtx(testMode = false))
      val back = graft.sources.Warc.readFiles(s, dir.toString)
      assert(back.select("target_uri").collect().map(_.getString(0)).toSeq
        == Seq("http://x/1"))
      // validate is total and checks columns
      val errs = Engine.validate(node, s, EngineCtx(testMode = true), df.schema)
      assert(errs.isEmpty, errs.toString)
      val bad = Engine.validate(Node.fromJson(
        s"""{"action":"output-warc",
           | "params":[{"path":"$dir","uri":"nope","date":"date","payload":"body"}]}""".stripMargin),
        s, EngineCtx(testMode = true), df.schema)
      assert(bad.nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("toWet / toWat: conversion and metadata derivatives round-trip") {
    val s = spark
    import s.implicits._
    val crawl = Seq((1L, archive())).toDF("file_id", "bytes")
    val recs = Warc.records(crawl, "bytes")
    // WET: conversion records whose payload is the extracted text
    val wet = Warc.records(Warc.toWet(Warc.responses(recs)), "record")
    val wrows = wet.collect()
    assert(wrows.length == 1)
    assert(wrows.head.getAs[String]("warc_type") == "conversion")
    assert(wrows.head.getAs[String]("target_uri") == "http://example.com/a")
    assert(new String(wrows.head.getAs[Array[Byte]]("payload"), UTF8)
      == "<html>hello crawl</html>")
    // WAT: metadata records whose payload is the envelope JSON
    val wat = Warc.records(Warc.toWat(recs), "record")
    val arows = wat.orderBy("target_uri").collect()
    assert(arows.forall(_.getAs[String]("warc_type") == "metadata"))
    val json = new String(arows.head.getAs[Array[Byte]]("payload"), UTF8)
    assert(json.contains("\"url\":\"http://example.com/a\"")
      && json.contains("\"length\":"), json)
  }

  test("responsesCharsetAware: header/meta charset drives the byte decode") {
    val s = spark
    import s.implicits._
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    def respWith(uri: String, ct: String, body: Array[Byte]) = {
      val head = (s"HTTP/1.1 200 OK\r\n$ct\r\n\r\n").getBytes(latin1)
      rec("response", uri, head ++ body)
    }
    val archive =
      // declared latin1: 0xE9 must decode to é, NOT a replacement char
      respWith("http://a/", "Content-Type: text/html; charset=ISO-8859-1",
        "café latin".getBytes(latin1)) ++
      // no header charset, meta sniff: UTF-8 bytes decode as UTF-8
      respWith("http://b/", "Content-Type: text/html",
        ("<meta charset=\"utf-8\">café utf".getBytes(UTF8))) ++
      // nothing declared: UTF-8 default; the lone 0xE9 is invalid UTF-8
      // and must surface as the replacement char, not kill the task
      respWith("http://c/", "Content-Type: text/plain",
        "café bare".getBytes(latin1)) ++
      // cp1252 label: approximated as latin1 (byte-bijective)
      respWith("http://d/", "Content-Type: text/html; charset=windows-1252",
        "ok cp1252".getBytes(latin1))
    val out = Warc.responsesCharsetAware(
        Warc.records(Seq(archive).toDF("bytes"), "bytes"))
      .select("target_uri", "charset", "text").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("http://a/") == ("iso-8859-1", "café latin"))
    assert(out("http://b/") == ("utf-8", "<meta charset=\"utf-8\">café utf"))
    assert(out("http://c/")._1 == null)
    assert(out("http://c/")._2 == "caf� bare")
    assert(out("http://d/") == ("windows-1252", "ok cp1252"))
  }

  test("readFiles: directory of .warc + .warc.gz with provenance") {
    val dir = java.nio.file.Files.createTempDirectory("warc_in")
    try {
      java.nio.file.Files.write(dir.resolve("a.warc"), archive())
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(rec("resource", "http://x/gz", "zzz".getBytes(UTF8))); g.close()
      java.nio.file.Files.write(dir.resolve("b.warc.gz"), bos.toByteArray)
      val out = Warc.readFiles(spark, dir.toString)
      assert(out.count() == 4L)
      assert(out.filter(col("target_uri") === "http://x/gz").count() == 1L)
      assert(out.columns.contains("path"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
