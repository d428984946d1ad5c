package graft

import graft.sources.{Cdx, Warc}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDX(J) crawl-index surface: SURT urlkey rules on literal fixtures,
  * CDXJ parse totality on garbage, the warc → index → lines → parse
  * round trip, and the IR chain. The SURT transform itself is
  * oracle-gated against an independent DuckDB implementation
  * (`surt_key`, `cdx_roundtrip`).
  */
class CdxSpec extends AnyFunSuite {
  import TestSpark.spark

  private def surtOf(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(Cdx.surtKey(col("u")).as("k"))
      .collect().head.getAs[String]("k")
  }

  test("surtKey: published SURT rules on literal URLs") {
    assert(surtOf("http://WWW.Sub.Example.ORG:80/A/B?b=2&a=1#f")
      == "org,example,sub)/a/b?a=1&b=2")
    assert(surtOf("https://example.com") == "com,example)/")
    assert(surtOf("https://example.com:443/x") == "com,example)/x")
    assert(surtOf("http://example.com:8080/x") == "com,example:8080)/x")
    assert(surtOf("http://www3.example.com/") == "com,example)/")
    // https default port kept when scheme is http (and vice versa)
    assert(surtOf("http://example.com:443/x") == "com,example:443)/x")
    // empty params dropped, duplicates kept, sort is bytewise
    assert(surtOf("http://e.com/p?z=1&&y=2&y=1") == "com,e)/p?y=1&y=2&z=1")
    assert(surtOf("ftp://example.com/x") == null)
    assert(surtOf("not a url") == null)
  }

  test("parseCdxj: fields recovered, garbage and truncated lines dropped") {
    import spark.implicits._
    val good =
      """com,example)/a 20240101000000 {"url":"http://example.com/a","mime":"text/html","status":200,"digest":"abcd","length":42,"offset":7,"filename":"x.warc.gz"}"""
    val sparse = """com,example)/b 20240102030405 {"url":"http://example.com/b"}"""
    val rows = Cdx.parseCdxj(Seq(
        good, sparse,
        "garbage line with no timestamp",
        "com,example)/c 2024 {\"url\":\"short-ts\"}",
        "").toDF("line"))
      .orderBy("urlkey").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[String]("urlkey") == "com,example)/a")
    assert(a.getAs[String]("ts") == "20240101000000")
    assert(a.getAs[String]("mime") == "text/html")
    assert(a.getAs[Int]("status") == 200)
    assert(a.getAs[Long]("length") == 42L)
    assert(a.getAs[String]("filename") == "x.warc.gz")
    val b = rows(1)
    assert(b.getAs[String]("url") == "http://example.com/b")
    assert(b.isNullAt(b.fieldIndex("mime")) && b.isNullAt(b.fieldIndex("length")))
  }

  test("warc -> index -> cdxj -> parse round trip preserves capture facts") {
    import spark.implicits._
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val body = "<html>indexed</html>"
    val payload = body.getBytes(UTF8)
    val archive =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Target-URI: http://WWW.Example.com/Page?b=1&a=2\r\n" +
        s"WARC-Date: 2024-03-04T05:06:07Z\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF8) ++
        payload ++ "\r\n\r\n".getBytes(UTF8)
    val recs = Warc.records(Seq(archive).toDF("bytes"), "bytes")
    val parsed = Cdx.parseCdxj(Cdx.cdxjLines(Cdx.index(recs))).collect()
    assert(parsed.length == 1)
    val r = parsed.head
    assert(r.getAs[String]("urlkey") == "com,example)/page?a=2&b=1")
    assert(r.getAs[String]("ts") == "20240304050607")
    assert(r.getAs[String]("url") == "http://WWW.Example.com/Page?b=1&a=2")
    assert(r.getAs[Long]("length") == payload.length.toLong)
    // digest is the repo convention: md5 hex of the payload bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    assert(r.getAs[String]("digest") == hex)
  }

  test("index: records without a target URI (warcinfo) are skipped") {
    import spark.implicits._
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val info = "software: test\r\n".getBytes(UTF8)
    val archive =
      (s"WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${info.length}\r\n\r\n").getBytes(UTF8) ++
        info ++ "\r\n\r\n".getBytes(UTF8)
    val recs = Warc.records(Seq(archive).toDF("bytes"), "bytes")
    assert(Cdx.index(recs).count() == 0)
  }

  test("index-as-you-crawl: streaming WARC landing dir -> live CDX index") {
    val s = spark
    import s.implicits._
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val land = java.nio.file.Files.createTempDirectory("cdx_land")
    try {
      def res(uri: String, body: String) = {
        val p = body.getBytes(UTF8)
        (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: $uri\r\n" +
          s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${p.length}\r\n\r\n")
          .getBytes(UTF8) ++ p ++ "\r\n\r\n".getBytes(UTF8)
      }
      java.nio.file.Files.write(land.resolve("b1.warc"),
        res("http://a.example/x", "one") ++ res("http://b.example/y", "two"))
      val idx = Cdx.index(Warc.readStreamFiles(s, land.toString))
      assert(idx.isStreaming)
      val q = idx.writeStream.format("memory").queryName("cdx_live")
        .outputMode("append").start()
      q.processAllAvailable()
      java.nio.file.Files.write(land.resolve("b2.warc"),
        res("http://c.example/z", "three"))
      q.processAllAvailable(); q.stop()
      val keys = s.table("cdx_live").select("urlkey").collect()
        .map(_.getString(0)).sorted
      assert(keys.toSeq == Seq("example,a)/x", "example,b)/y", "example,c)/z"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(land).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("writeIndex layout: site-slice predicate pushes into the parquet scan") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdx_idx").toString
    try {
      val idx = (0L until 400L).map { i =>
        (s"org,site${i % 8})/p/$i", f"202401${i % 28 + 1}%02d000000",
          s"http://site${i % 8}.org/p/$i", s"dg$i", i)
      }.toDF("urlkey", "ts", "url", "digest", "length")
      Cdx.writeIndex(idx, s"$dir/idx", shards = 4)
      val slice = Cdx.siteSlice(Cdx.readIndex(s, s"$dir/idx"), "org,site3)")
      val rows = slice.collect()
      assert(rows.length == 50 && rows.forall(_.getString(0).startsWith("org,site3)")))
      // the prefix predicate reached the scan
      val scans = slice.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
      assert(pushed.contains("StringStartsWith(urlkey,org,site3)"), pushed)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("surt-key / cdx-index / cdx-parse are declarable IR actions") {
    import graft.ir.{Engine, EngineCtx, Node}
    import spark.implicits._
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val payload = "hello".getBytes(UTF8)
    val archive =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Target-URI: https://a.example.org/x\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF8) ++
        payload ++ "\r\n\r\n".getBytes(UTF8)
    val in = Seq(archive).toDF("bytes")
    val chain = Node.fromJson(
      """{"action":"warc-records","params":[{"bin":"bytes"}],"children":[
        | {"action":"cdx-index","children":[
        |  {"action":"tap","params":["idx"]}]}]}""".stripMargin)
    val idx = Engine.run(chain, in, EngineCtx(testMode = true)).taps("idx")
    assert(idx.select("urlkey").as[String].collect().toSeq
      == Seq("org,example,a)/x"))
    val keyed = Engine.run(Node.fromJson(
        """{"action":"surt-key","params":[{"url":"u","out":"k"}],"children":[
          | {"action":"tap","params":["out"]}]}""".stripMargin),
      Seq("http://www.b.org/Q?x=1").toDF("u"), EngineCtx(testMode = true)).taps("out")
    assert(keyed.select("k").as[String].collect().toSeq == Seq("org,b)/q?x=1"))
    val back = Engine.run(Node.fromJson(
        """{"action":"cdx-parse","children":[
          | {"action":"tap","params":["out"]}]}""".stripMargin),
      Cdx.cdxjLines(idx), EngineCtx(testMode = true)).taps("out")
    assert(back.select("url").as[String].collect().toSeq
      == Seq("https://a.example.org/x"))
  }
}
