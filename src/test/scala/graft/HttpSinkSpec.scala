package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sinks.HttpSink
import graft.sinks.HttpSink.Http
import graft.sources.WireCodecs
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** On-the-wire tests for the outbound HTTP transports: a local JDK
  * HttpServer records what arrives; assertions are on the received bytes
  * and headers, not on internals.
  */
class HttpSinkSpec extends AnyFunSuite {
  import TestSpark._

  /** (path, contentType, contentEncoding, auth, body) per request. */
  final case class Received(path: String, contentType: String,
                            encoding: String, auth: String, body: Array[Byte])

  /** Start a recorder server; `failFirst` many requests get `failCode`. */
  private def withServer(failFirst: Int = 0, failCode: Int = 500)(run: (String, CopyOnWriteArrayList[Received]) => Unit): Unit = {
    val received = new CopyOnWriteArrayList[Received]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 16)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = x.getRequestBody.readAllBytes()
        val h = x.getRequestHeaders
        def first(k: String) = Option(h.getFirst(k)).getOrElse("")
        if (failures.getAndDecrement() > 0) {
          x.sendResponseHeaders(failCode, -1)
        } else {
          received.add(Received(x.getRequestURI.getPath, first("Content-type"),
            first("Content-encoding"), first("Authorization"), body))
          x.sendResponseHeaders(200, -1)
        }
        x.close()
      }
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", received)
    finally server.stop(0)
  }

  test("elasticsearch: ndjson bulk batches arrive with auth, date-suffixed index") {
    withServer() { (base, rec) =>
      val df = events(ev(1.0, 0L, service = "a"), ev(2.0, 1000000000L, service = "b"),
                      ev(3.0, 2000000000L, service = "c"))
      HttpSink.elasticsearch(
        Http(s"$base/_bulk", basicAuth = Some(("u", "pw"))), "logs", bulkSize = 2)(df)
      val all = rec.asScala.toSeq
      assert(all.forall(_.path == "/_bulk"))
      assert(all.forall(_.contentType == "application/x-ndjson"))
      assert(all.forall(_.auth.startsWith("Basic ")))
      val lines = all.flatMap(r => new String(r.body, UTF_8).split("\n"))
      assert(lines.size == 6) // 3 events x (action line + source line)
      assert(lines.grouped(2).forall(_.head.contains("\"_index\":\"logs-1970-01-01\"")))
      // no request carries more than bulkSize events
      assert(all.forall(r => new String(r.body, UTF_8).split("\n").length <= 4))
    }
  }

  test("pagerduty: one JSON body per event, trigger/resolve mapping") {
    withServer() { (base, rec) =>
      val df = events(ev(1.0, 0L, state = "critical", service = "db"),
                      ev(2.0, 0L, state = "ok", service = "web"))
      HttpSink.pagerduty(Http(s"$base/v2/enqueue"), "rk", "host",
        summaryKeys = Seq("service", "state"), dedupKeys = Seq("host", "service"))(df)
      val bodies = rec.asScala.toSeq.map(r => new String(r.body, UTF_8)).sorted
      assert(bodies.size == 2)
      assert(bodies.exists(b => b.contains("\"event_action\":\"trigger\"") &&
        b.contains("\"summary\":\"db - critical\"") && b.contains("\"dedup_key\":\"h1-db\"")))
      assert(bodies.exists(b => b.contains("\"event_action\":\"resolve\"") &&
        b.contains("\"severity\":\"info\"")))
      assert(bodies.forall(_.contains("\"routing_key\":\"rk\"")))
    }
  }

  test("prometheus: snappy protobuf round-trips through the ingestion codec") {
    withServer() { (base, rec) =>
      val df = events(
        ev(1.5, 1000000000L, service = "cpu", attributes = Map("host" -> "a")),
        ev(2.5, 2000000000L, service = "cpu", attributes = Map("host" -> "a")),
        ev(9.0, 1000000000L, service = "mem", attributes = Map("host" -> "b")))
        .drop("name").withColumnRenamed("service", "name")
      HttpSink.prometheus(Http(s"$base/api/v1/write"))(df)
      val all = rec.asScala.toSeq
      assert(all.forall(_.encoding == "snappy"))
      assert(all.forall(_.contentType == "application/x-protobuf"))
      val decoded = all.flatMap { r =>
        WireCodecs.decodePromWriteRequest(
          org.xerial.snappy.Snappy.uncompress(r.body)).timeseries
      }
      assert(decoded.size == 2) // one series per (name, attributes)
      val cpu = decoded.find(_.labels.contains(WireCodecs.PromLabel("__name__", "cpu"))).get
      assert(cpu.labels.contains(WireCodecs.PromLabel("host", "a")))
      assert(cpu.samples.map(s => (s.value, s.timestamp)).sorted ==
        Seq((1.5, 1000L), (2.5, 2000L)))
    }
  }

  test("retry: a 500 is retried with backoff; exhausted retries fail the job") {
    withServer(failFirst = 1) { (base, rec) =>
      HttpSink.elasticsearch(Http(s"$base/_bulk", backoffMs = 1), "i")(events(ev(1.0, 0L)))
      assert(rec.asScala.size == 1) // failed attempt + successful retry
    }
    withServer(failFirst = 10) { (base, _) =>
      val e = intercept[org.apache.spark.SparkException] {
        HttpSink.elasticsearch(Http(s"$base/_bulk", maxRetries = 1, backoffMs = 1),
          "i")(events(ev(1.0, 0L)))
      }
      assert(e.getMessage.contains("failed after") ||
        Option(e.getCause).exists(_.getMessage.contains("failed after")))
    }
  }

  test("a non-retryable 4xx fails on the first attempt instead of resending a doomed body") {
    withServer(failFirst = 10, failCode = 400) { (base, _) =>
      val e = intercept[org.apache.spark.SparkException] {
        HttpSink.elasticsearch(Http(s"$base/_bulk", maxRetries = 3, backoffMs = 1),
          "i")(events(ev(1.0, 0L)))
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("HTTP 400"))
      assert(msg.contains("after 1 attempt")) // not maxRetries+1
    }
  }

  test("streaming twin ships micro-batches through the same transport") {
    withServer() { (base, rec) =>
      val s = spark
      import s.implicits._
      implicit val sq: org.apache.spark.sql.classic.SQLContext =
        s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.model.Event]
      mem.addData(ev(1.0, 0L, service = "a"), ev(2.0, 1000000000L, service = "b"))
      val cp = java.nio.file.Files.createTempDirectory("httpsink-cp").toString
      val q = HttpSink.stream(mem.toDF(), cp)(HttpSink.elasticsearch(Http(s"$base/_bulk"), "st"))
      try q.processAllAvailable() finally q.stop()
      val lines = rec.asScala.toSeq.flatMap(r => new String(r.body, UTF_8).split("\n"))
      assert(lines.count(_.contains("\"_index\":\"st-1970-01-01\"")) == 2)
    }
  }
}
