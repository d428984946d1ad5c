package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled wire codecs for the two remaining HTTP ingestion protocols
  * of the reference's handler (`handler.clj:77-106, 117-135`):
  *
  *  - Prometheus remote-write: snappy-framed protobuf `WriteRequest`
  *    (public proto spec `prometheus/prompb/remote.proto`, `types.proto`:
  *    `WriteRequest.timeseries=1`; `TimeSeries.labels=1, samples=2`;
  *    `Label.name=1, value=2`; `Sample.value=1 (double), timestamp=2`).
  *  - OTLP traces: protobuf `ExportTraceServiceRequest` (public proto spec
  *    `opentelemetry/proto/trace/v1/trace.proto`: `resource_spans=1`;
  *    `ResourceSpans.resource=1, scope_spans=2`; `Resource.attributes=1`;
  *    `ScopeSpans.spans=2`; `Span.trace_id=1, span_id=2,
  *    parent_span_id=4, name=5, kind=6, start=7, end=8, attributes=9,
  *    status=15`; `Status.message=2, code=3`; `KeyValue.key=1, value=2`;
  *    `AnyValue.string=1, bool=2, int=3, double=4`).
  *
  * Like [[RiemannCodec]], this parses the public wire format directly (no
  * generated protobuf classes): varint/fixed64/length-delimited fields,
  * unknown fields skipped, so schema additions in either protocol don't
  * break decode. The decoded case classes mirror the input schemas of the
  * gated Column mappings ([[Decode.prometheusWrite]], [[Decode.otlpSpans]])
  * so the same decode plans serve files, streams, and the HTTP routes.
  */
object WireCodecs {

  // ---- prometheus remote-write --------------------------------------

  final case class PromLabel(name: String, value: String)
  final case class PromSample(value: Double, timestamp: Long)
  final case class PromSeries(labels: Seq[PromLabel], samples: Seq[PromSample])
  final case class PromWriteRequest(timeseries: Seq[PromSeries])

  def decodePromWriteRequest(bytes: Array[Byte]): PromWriteRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val series = Seq.newBuilder[PromSeries]
    while (r.hasRemaining) {
      val tag = r.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val (off, len) = r.bytes()
        series += decodeSeries(bytes, off, len)
      } else r.skip((tag & 7).toInt)
    }
    PromWriteRequest(series.result())
  }

  private def decodeSeries(buf: Array[Byte], off: Int, len: Int): PromSeries = {
    val r = new Reader(buf, off, off + len)
    val labels = Seq.newBuilder[PromLabel]
    val samples = Seq.newBuilder[PromSample]
    while (r.hasRemaining) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          var name = ""; var value = ""
          while (rr.hasRemaining) {
            val t = rr.varint()
            ((t >> 3).toInt, (t & 7).toInt) match {
              case (1, 2) => name = rr.string()
              case (2, 2) => value = rr.string()
              case (_, w) => rr.skip(w)
            }
          }
          labels += PromLabel(name, value)
        case (2, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          var v = 0.0; var ts = 0L
          while (rr.hasRemaining) {
            val t = rr.varint()
            ((t >> 3).toInt, (t & 7).toInt) match {
              case (1, 1) => v = java.lang.Double.longBitsToDouble(rr.fixed64())
              case (2, 0) => ts = rr.varint()
              case (_, w) => rr.skip(w)
            }
          }
          samples += PromSample(v, ts)
        case (_, w) => r.skip(w)
      }
    }
    PromSeries(labels.result(), samples.result())
  }

  /** Encode (for tests and the prometheus sink payload path): the exact
    * inverse of [[decodePromWriteRequest]].
    */
  def encodePromWriteRequest(req: PromWriteRequest): Array[Byte] = {
    val w = new Writer
    req.timeseries.foreach { s =>
      val sw = new Writer
      s.labels.foreach { l =>
        val lw = new Writer
        lw.str(1, l.name); lw.str(2, l.value)
        sw.msg(1, lw)
      }
      s.samples.foreach { sm =>
        val mw = new Writer
        mw.fixed64(1, java.lang.Double.doubleToLongBits(sm.value))
        mw.varintField(2, sm.timestamp)
        sw.msg(2, mw)
      }
      w.msg(1, sw)
    }
    w.result()
  }

  /** One decoded remote-write sample (the wire twin of
    * [[Decode.prometheusWrite]]'s output row).
    */
  final case class PromDecoded(name: String, attributes: Map[String, String],
                               metric: Double, time: Long)

  /** Distributed wire decode: a binary column of `WriteRequest` payloads
    * (one per ingest batch/scrape) → one row per sample. Byte parsing
    * parallelizes per input split like [[RiemannCodec.decodeStreams]] —
    * no shuffle, no driver involvement; this is the bulk path the HTTP
    * route's driver-side decode mirrors.
    */
  def decodePromFrames(df: org.apache.spark.sql.DataFrame,
                       bytesCol: String = "payload"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(bytesCol)).as[Array[Byte]].flatMap { bytes =>
      decodePromWriteRequest(bytes).timeseries.flatMap { s =>
        val labels = s.labels.map(l => l.name -> l.value).toMap
        s.samples.map(sm => PromDecoded(labels.getOrElse("__name__", null),
          labels - "__name__", sm.value, sm.timestamp * 1000000L))
      }
    }.toDF()
  }

  // ---- OTLP traces ---------------------------------------------------

  final case class OtlpKV(key: String, value: String)
  final case class OtlpStatus(code: Long, message: String)
  final case class OtlpSpan(traceId: String, spanId: String, parentSpanId: String,
                            name: String, kind: Long,
                            startTimeUnixNano: Long, endTimeUnixNano: Long,
                            status: OtlpStatus, attributes: Seq[OtlpKV])
  final case class OtlpScopeSpans(spans: Seq[OtlpSpan])
  final case class OtlpResource(attributes: Seq[OtlpKV])
  final case class OtlpResourceSpans(resource: OtlpResource, scopeSpans: Seq[OtlpScopeSpans])
  final case class OtlpTraceRequest(resourceSpans: Seq[OtlpResourceSpans])

  def decodeOtlpTraceRequest(bytes: Array[Byte]): OtlpTraceRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val rs = Seq.newBuilder[OtlpResourceSpans]
    while (r.hasRemaining) {
      val tag = r.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val (off, len) = r.bytes()
        rs += decodeResourceSpans(bytes, off, len)
      } else r.skip((tag & 7).toInt)
    }
    OtlpTraceRequest(rs.result())
  }

  private def decodeResourceSpans(buf: Array[Byte], off: Int, len: Int): OtlpResourceSpans = {
    val r = new Reader(buf, off, off + len)
    var resource = OtlpResource(Nil)
    val scopes = Seq.newBuilder[OtlpScopeSpans]
    while (r.hasRemaining) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val attrs = Seq.newBuilder[OtlpKV]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (ko, kl) = rr.bytes()
              attrs += decodeKeyValue(buf, ko, kl)
            } else rr.skip((t & 7).toInt)
          }
          resource = OtlpResource(attrs.result())
        case (2, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val spans = Seq.newBuilder[OtlpSpan]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 2 && (t & 7) == 2) {
              val (so, sl) = rr.bytes()
              spans += decodeSpan(buf, so, sl)
            } else rr.skip((t & 7).toInt)
          }
          scopes += OtlpScopeSpans(spans.result())
        case (_, w) => r.skip(w)
      }
    }
    OtlpResourceSpans(resource, scopes.result())
  }

  /** AnyValue → string (string/bool/int/double variants; nested
    * kvlist/array variants skip to ""): the stringly-typed reduction
    * every attribute and log body shares.
    */
  private def decodeAnyValue(buf: Array[Byte], off: Int, len: Int): String = {
    val rr = new Reader(buf, off, off + len)
    var value = ""
    while (rr.hasRemaining) {
      val vt = rr.varint()
      ((vt >> 3).toInt, (vt & 7).toInt) match {
        case (1, 2) => value = rr.string()
        case (2, 0) => value = (rr.varint() != 0).toString
        case (3, 0) => value = rr.varint().toString
        case (4, 1) => value = java.lang.Double.longBitsToDouble(rr.fixed64()).toString
        case (_, w) => rr.skip(w)
      }
    }
    value
  }

  private def decodeKeyValue(buf: Array[Byte], off: Int, len: Int): OtlpKV = {
    val r = new Reader(buf, off, off + len)
    var key = ""; var value = ""
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) => key = r.string()
        case (2, 2) =>
          val (o, l) = r.bytes()
          value = decodeAnyValue(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    OtlpKV(key, value)
  }

  private def decodeSpan(buf: Array[Byte], off: Int, len: Int): OtlpSpan = {
    val r = new Reader(buf, off, off + len)
    var traceId = ""; var spanId = ""; var parentSpanId = ""
    var name = ""; var kind = 0L; var start = 0L; var end = 0L
    var status = OtlpStatus(0, null)
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) => traceId = hex(r.bytesCopy())
        case (2, 2) => spanId = hex(r.bytesCopy())
        case (4, 2) => parentSpanId = hex(r.bytesCopy())
        case (5, 2) => name = r.string()
        case (6, 0) => kind = r.varint()
        case (7, 1) => start = r.fixed64()
        case (8, 1) => end = r.fixed64()
        case (9, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (15, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          var msg: String = null; var code = 0L
          while (rr.hasRemaining) {
            val st = rr.varint()
            ((st >> 3).toInt, (st & 7).toInt) match {
              case (2, 2) => msg = rr.string()
              case (3, 0) => code = rr.varint()
              case (_, w) => rr.skip(w)
            }
          }
          status = OtlpStatus(code, msg)
        case (_, w) => r.skip(w)
      }
    }
    OtlpSpan(traceId, spanId, parentSpanId, name, kind, start, end, status, attrs.result())
  }

  /** Distributed OTLP wire decode: a binary column of
    * `ExportTraceServiceRequest` payloads → the struct shape
    * [[Decode.otlpSpans]] consumes — so the gated Column mapping runs
    * unchanged downstream of wire bytes. Per-split flatMap, no shuffle.
    */
  def decodeOtlpFrames(df: org.apache.spark.sql.DataFrame,
                       bytesCol: String = "payload"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(bytesCol)).as[Array[Byte]]
      .map(bytes => decodeOtlpTraceRequest(bytes))
      .toDF()
  }

  /** Encode (tests): inverse of [[decodeOtlpTraceRequest]] for the fields
    * this library reads.
    */
  def encodeOtlpTraceRequest(req: OtlpTraceRequest): Array[Byte] = {
    def kv(w: Writer, field: Int, k: OtlpKV): Unit = {
      val kw = new Writer
      kw.str(1, k.key)
      val vw = new Writer
      vw.str(1, k.value)
      kw.msg(2, vw)
      w.msg(field, kw)
    }
    val w = new Writer
    req.resourceSpans.foreach { rs =>
      val rw = new Writer
      val resw = new Writer
      rs.resource.attributes.foreach(kv(resw, 1, _))
      rw.msg(1, resw)
      rs.scopeSpans.foreach { ss =>
        val ssw = new Writer
        ss.spans.foreach { sp =>
          val sw = new Writer
          sw.bytesField(1, unhex(sp.traceId))
          sw.bytesField(2, unhex(sp.spanId))
          if (sp.parentSpanId.nonEmpty) sw.bytesField(4, unhex(sp.parentSpanId))
          sw.str(5, sp.name)
          sw.varintField(6, sp.kind)
          sw.fixed64(7, sp.startTimeUnixNano)
          sw.fixed64(8, sp.endTimeUnixNano)
          sp.attributes.foreach(kv(sw, 9, _))
          val stw = new Writer
          if (sp.status.message != null) stw.str(2, sp.status.message)
          stw.varintField(3, sp.status.code)
          sw.msg(15, stw)
          ssw.msg(2, sw)
        }
        rw.msg(2, ssw)
      }
      w.msg(1, rw)
    }
    w.result()
  }

  // ---- OTLP metrics --------------------------------------------------
  // public proto spec `opentelemetry/proto/metrics/v1/metrics.proto`:
  // `ExportMetricsServiceRequest.resource_metrics=1`;
  // `ResourceMetrics.resource=1, scope_metrics=2`;
  // `ScopeMetrics.metrics=2`; `Metric.name=1, description=2, unit=3,
  // gauge=5, sum=7, histogram=9`; `Gauge.data_points=1`;
  // `Sum.data_points=1, is_monotonic=3`; `Histogram.data_points=1`;
  // `NumberDataPoint.start_time_unix_nano=2, time_unix_nano=3,
  // as_double=4, as_int=6 (both fixed64), attributes=7`;
  // `HistogramDataPoint.start_time_unix_nano=2, time_unix_nano=3,
  // count=4 (fixed64), sum=5 (double), bucket_counts=6 (packed
  // fixed64), explicit_bounds=7 (packed double), attributes=9`;
  // `Metric.summary=11`; `Summary.data_points=1`;
  // `SummaryDataPoint.start_time_unix_nano=2, time_unix_nano=3,
  // count=4 (fixed64), sum=5 (double), quantile_values=6,
  // attributes=7`; `ValueAtQuantile.quantile=1, value=2 (doubles)`.

  final case class OtlpNumPoint(startTimeUnixNano: Long, timeUnixNano: Long,
                                asDouble: Double, attributes: Seq[OtlpKV])
  final case class OtlpHistPoint(startTimeUnixNano: Long, timeUnixNano: Long,
                                 count: Long, sum: Double,
                                 bucketCounts: Seq[Long],
                                 explicitBounds: Seq[Double],
                                 attributes: Seq[OtlpKV])
  /** One side (positive/negative) of an exponential-histogram point:
    * base-2^(2^-scale) buckets starting at `offset`.
    */
  final case class OtlpExpBuckets(offset: Long, bucketCounts: Seq[Long])
  final case class OtlpExpHistPoint(startTimeUnixNano: Long, timeUnixNano: Long,
                                    count: Long, sum: Double, scale: Long,
                                    zeroCount: Long,
                                    positive: OtlpExpBuckets,
                                    negative: OtlpExpBuckets,
                                    attributes: Seq[OtlpKV])
  /** One φ-quantile readout of a legacy-Prometheus summary point. */
  final case class OtlpQuantileValue(quantile: Double, value: Double)
  final case class OtlpSummaryPoint(startTimeUnixNano: Long, timeUnixNano: Long,
                                    count: Long, sum: Double,
                                    quantileValues: Seq[OtlpQuantileValue],
                                    attributes: Seq[OtlpKV])
  final case class OtlpGauge(dataPoints: Seq[OtlpNumPoint])
  final case class OtlpSum(dataPoints: Seq[OtlpNumPoint], isMonotonic: Boolean)
  final case class OtlpHistogram(dataPoints: Seq[OtlpHistPoint])
  final case class OtlpExpHistogram(dataPoints: Seq[OtlpExpHistPoint])
  final case class OtlpSummary(dataPoints: Seq[OtlpSummaryPoint])
  final case class OtlpMetric(name: String, unit: String,
                              gauge: OtlpGauge, sum: OtlpSum,
                              histogram: OtlpHistogram,
                              expHistogram: OtlpExpHistogram =
                                OtlpExpHistogram(Nil),
                              summary: OtlpSummary = OtlpSummary(Nil))
  final case class OtlpScopeMetrics(metrics: Seq[OtlpMetric])
  final case class OtlpResourceMetrics(resource: OtlpResource,
                                       scopeMetrics: Seq[OtlpScopeMetrics])
  final case class OtlpMetricsRequest(resourceMetrics: Seq[OtlpResourceMetrics])

  def decodeOtlpMetricsRequest(bytes: Array[Byte]): OtlpMetricsRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val rms = Seq.newBuilder[OtlpResourceMetrics]
    while (r.hasRemaining) {
      val tag = r.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val (off, len) = r.bytes()
        rms += decodeResourceMetrics(bytes, off, len)
      } else r.skip((tag & 7).toInt)
    }
    OtlpMetricsRequest(rms.result())
  }

  private def decodeResourceMetrics(buf: Array[Byte], off: Int, len: Int): OtlpResourceMetrics = {
    val r = new Reader(buf, off, off + len)
    var resource = OtlpResource(Nil)
    val scopes = Seq.newBuilder[OtlpScopeMetrics]
    while (r.hasRemaining) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val attrs = Seq.newBuilder[OtlpKV]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (ko, kl) = rr.bytes()
              attrs += decodeKeyValue(buf, ko, kl)
            } else rr.skip((t & 7).toInt)
          }
          resource = OtlpResource(attrs.result())
        case (2, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val metrics = Seq.newBuilder[OtlpMetric]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 2 && (t & 7) == 2) {
              val (mo, ml) = rr.bytes()
              metrics += decodeMetric(buf, mo, ml)
            } else rr.skip((t & 7).toInt)
          }
          scopes += OtlpScopeMetrics(metrics.result())
        case (_, w) => r.skip(w)
      }
    }
    OtlpResourceMetrics(resource, scopes.result())
  }

  private def decodeMetric(buf: Array[Byte], off: Int, len: Int): OtlpMetric = {
    val r = new Reader(buf, off, off + len)
    var name = ""; var unit = ""
    var gauge = OtlpGauge(Nil); var sum = OtlpSum(Nil, isMonotonic = false)
    var hist = OtlpHistogram(Nil); var expHist = OtlpExpHistogram(Nil)
    var summary = OtlpSummary(Nil)
    def numPoints(o: Int, l: Int): (Seq[OtlpNumPoint], Boolean) = {
      val rr = new Reader(buf, o, o + l)
      val pts = Seq.newBuilder[OtlpNumPoint]
      var monotonic = false
      while (rr.hasRemaining) {
        val t = rr.varint()
        ((t >> 3).toInt, (t & 7).toInt) match {
          case (1, 2) =>
            val (po, pl) = rr.bytes()
            pts += decodeNumPoint(buf, po, pl)
          case (3, 0) => monotonic = rr.varint() != 0
          case (_, w) => rr.skip(w)
        }
      }
      (pts.result(), monotonic)
    }
    while (r.hasRemaining) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => name = r.string()
        case (3, 2) => unit = r.string()
        case (5, 2) =>
          val (o, l) = r.bytes(); gauge = OtlpGauge(numPoints(o, l)._1)
        case (7, 2) =>
          val (o, l) = r.bytes(); val (pts, mono) = numPoints(o, l)
          sum = OtlpSum(pts, mono)
        case (9, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val pts = Seq.newBuilder[OtlpHistPoint]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (po, pl) = rr.bytes()
              pts += decodeHistPoint(buf, po, pl)
            } else rr.skip((t & 7).toInt)
          }
          hist = OtlpHistogram(pts.result())
        case (10, 2) => // exponential_histogram
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val pts = Seq.newBuilder[OtlpExpHistPoint]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (po, pl) = rr.bytes()
              pts += decodeExpHistPoint(buf, po, pl)
            } else rr.skip((t & 7).toInt)
          }
          expHist = OtlpExpHistogram(pts.result())
        case (11, 2) => // summary (legacy-Prometheus quantile family)
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val pts = Seq.newBuilder[OtlpSummaryPoint]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (po, pl) = rr.bytes()
              pts += decodeSummaryPoint(buf, po, pl)
            } else rr.skip((t & 7).toInt)
          }
          summary = OtlpSummary(pts.result())
        case (_, w) => r.skip(w)
      }
    }
    OtlpMetric(name, unit, gauge, sum, hist, expHist, summary)
  }

  private def decodeSummaryPoint(buf: Array[Byte], off: Int, len: Int): OtlpSummaryPoint = {
    val r = new Reader(buf, off, off + len)
    var start = 0L; var time = 0L; var count = 0L; var sum = 0.0
    val qs = Seq.newBuilder[OtlpQuantileValue]
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          var q = 0.0; var v = 0.0
          while (rr.hasRemaining) {
            val tt = rr.varint()
            ((tt >> 3).toInt, (tt & 7).toInt) match {
              case (1, 1) => q = java.lang.Double.longBitsToDouble(rr.fixed64())
              case (2, 1) => v = java.lang.Double.longBitsToDouble(rr.fixed64())
              case (_, w) => rr.skip(w)
            }
          }
          qs += OtlpQuantileValue(q, v)
        case (7, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    OtlpSummaryPoint(start, time, count, sum, qs.result(), attrs.result())
  }

  /** Protobuf zigzag decode (sint32/sint64 wire form). */
  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def decodeExpBuckets(buf: Array[Byte], off: Int, len: Int): OtlpExpBuckets = {
    val r = new Reader(buf, off, off + len)
    var offset = 0L
    val counts = Seq.newBuilder[Long]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 0) => offset = zigzag(r.varint())
        case (2, 2) => // packed varint bucket counts
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          while (rr.hasRemaining) counts += rr.varint()
        case (2, 0) => counts += r.varint() // unpacked form, legal too
        case (_, w) => r.skip(w)
      }
    }
    OtlpExpBuckets(offset, counts.result())
  }

  private def decodeExpHistPoint(buf: Array[Byte], off: Int, len: Int): OtlpExpHistPoint = {
    val r = new Reader(buf, off, off + len)
    var start = 0L; var time = 0L; var count = 0L; var sum = 0.0
    var scale = 0L; var zero = 0L
    var pos = OtlpExpBuckets(0, Nil); var neg = OtlpExpBuckets(0, Nil)
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 0) => scale = zigzag(r.varint())
        case (7, 1) => zero = r.fixed64()
        case (8, 2) =>
          val (o, l) = r.bytes(); pos = decodeExpBuckets(buf, o, l)
        case (9, 2) =>
          val (o, l) = r.bytes(); neg = decodeExpBuckets(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    OtlpExpHistPoint(start, time, count, sum, scale, zero, pos, neg, attrs.result())
  }

  private def decodeNumPoint(buf: Array[Byte], off: Int, len: Int): OtlpNumPoint = {
    val r = new Reader(buf, off, off + len)
    var start = 0L; var time = 0L; var v = 0.0
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 1) => v = r.fixed64().toDouble // as_int: sfixed64 oneof arm
        case (7, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    OtlpNumPoint(start, time, v, attrs.result())
  }

  private def decodeHistPoint(buf: Array[Byte], off: Int, len: Int): OtlpHistPoint = {
    val r = new Reader(buf, off, off + len)
    var start = 0L; var time = 0L; var count = 0L; var sum = 0.0
    val buckets = Seq.newBuilder[Long]
    val bounds = Seq.newBuilder[Double]
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 2) => // packed fixed64 bucket counts
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          while (rr.hasRemaining) buckets += rr.fixed64()
        case (7, 2) => // packed double bounds
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          while (rr.hasRemaining)
            bounds += java.lang.Double.longBitsToDouble(rr.fixed64())
        case (9, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    OtlpHistPoint(start, time, count, sum, buckets.result(), bounds.result(), attrs.result())
  }

  /** Distributed OTLP metrics wire decode: binary
    * `ExportMetricsServiceRequest` payloads → the struct shape
    * [[Decode.otlpMetrics]] consumes. Per-split flatMap, no shuffle.
    */
  def decodeOtlpMetricFrames(df: org.apache.spark.sql.DataFrame,
                             bytesCol: String = "payload"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(bytesCol)).as[Array[Byte]]
      .map(bytes => decodeOtlpMetricsRequest(bytes))
      .toDF()
  }

  /** Encode (tests + sink payloads): inverse of
    * [[decodeOtlpMetricsRequest]] for the fields this library reads.
    */
  def encodeOtlpMetricsRequest(req: OtlpMetricsRequest): Array[Byte] = {
    def kv(w: Writer, field: Int, k: OtlpKV): Unit = {
      val kw = new Writer
      kw.str(1, k.key)
      val vw = new Writer
      vw.str(1, k.value)
      kw.msg(2, vw)
      w.msg(field, kw)
    }
    def numPoint(p: OtlpNumPoint): Writer = {
      val pw = new Writer
      pw.fixed64(2, p.startTimeUnixNano)
      pw.fixed64(3, p.timeUnixNano)
      pw.fixed64(4, java.lang.Double.doubleToLongBits(p.asDouble))
      p.attributes.foreach(kv(pw, 7, _))
      pw
    }
    val w = new Writer
    req.resourceMetrics.foreach { rm =>
      val rw = new Writer
      val resw = new Writer
      rm.resource.attributes.foreach(kv(resw, 1, _))
      rw.msg(1, resw)
      rm.scopeMetrics.foreach { sm =>
        val smw = new Writer
        sm.metrics.foreach { m =>
          val mw = new Writer
          mw.str(1, m.name)
          if (m.unit.nonEmpty) mw.str(3, m.unit)
          if (m.gauge.dataPoints.nonEmpty) {
            val gw = new Writer
            m.gauge.dataPoints.foreach(p => gw.msg(1, numPoint(p)))
            mw.msg(5, gw)
          }
          if (m.sum.dataPoints.nonEmpty) {
            val sw = new Writer
            m.sum.dataPoints.foreach(p => sw.msg(1, numPoint(p)))
            sw.varintField(3, if (m.sum.isMonotonic) 1L else 0L)
            mw.msg(7, sw)
          }
          if (m.histogram.dataPoints.nonEmpty) {
            val hw = new Writer
            m.histogram.dataPoints.foreach { p =>
              val pw = new Writer
              pw.fixed64(2, p.startTimeUnixNano)
              pw.fixed64(3, p.timeUnixNano)
              pw.fixed64(4, p.count)
              pw.fixed64(5, java.lang.Double.doubleToLongBits(p.sum))
              if (p.bucketCounts.nonEmpty) {
                val bw = new Writer
                p.bucketCounts.foreach(bw.rawFixed64)
                pw.msgBytes(6, bw)
              }
              if (p.explicitBounds.nonEmpty) {
                val bw = new Writer
                p.explicitBounds.foreach(d =>
                  bw.rawFixed64(java.lang.Double.doubleToLongBits(d)))
                pw.msgBytes(7, bw)
              }
              p.attributes.foreach(kv(pw, 9, _))
              hw.msg(1, pw)
            }
            mw.msg(9, hw)
          }
          if (m.expHistogram.dataPoints.nonEmpty) {
            def buckets(field: Int, b: OtlpExpBuckets, pw: Writer): Unit = {
              val bw = new Writer
              bw.sintField(1, b.offset)
              if (b.bucketCounts.nonEmpty) {
                val cw = new Writer
                b.bucketCounts.foreach(cw.rawVarint)
                bw.msgBytes(2, cw)
              }
              pw.msg(field, bw)
            }
            val hw = new Writer
            m.expHistogram.dataPoints.foreach { p =>
              val pw = new Writer
              p.attributes.foreach(kv(pw, 1, _))
              pw.fixed64(2, p.startTimeUnixNano)
              pw.fixed64(3, p.timeUnixNano)
              pw.fixed64(4, p.count)
              pw.fixed64(5, java.lang.Double.doubleToLongBits(p.sum))
              pw.sintField(6, p.scale)
              pw.fixed64(7, p.zeroCount)
              if (p.positive.bucketCounts.nonEmpty || p.positive.offset != 0)
                buckets(8, p.positive, pw)
              if (p.negative.bucketCounts.nonEmpty || p.negative.offset != 0)
                buckets(9, p.negative, pw)
              hw.msg(1, pw)
            }
            mw.msg(10, hw)
          }
          if (m.summary.dataPoints.nonEmpty) {
            val hw = new Writer
            m.summary.dataPoints.foreach { p =>
              val pw = new Writer
              pw.fixed64(2, p.startTimeUnixNano)
              pw.fixed64(3, p.timeUnixNano)
              pw.fixed64(4, p.count)
              pw.fixed64(5, java.lang.Double.doubleToLongBits(p.sum))
              p.quantileValues.foreach { q =>
                val qw = new Writer
                qw.fixed64(1, java.lang.Double.doubleToLongBits(q.quantile))
                qw.fixed64(2, java.lang.Double.doubleToLongBits(q.value))
                pw.msg(6, qw)
              }
              p.attributes.foreach(kv(pw, 7, _))
              hw.msg(1, pw)
            }
            mw.msg(11, hw)
          }
          smw.msg(2, mw)
        }
        rw.msg(2, smw)
      }
      w.msg(1, rw)
    }
    w.result()
  }

  // ---- OTLP logs ------------------------------------------------------
  // public proto spec `opentelemetry/proto/logs/v1/logs.proto`:
  // `ExportLogsServiceRequest.resource_logs=1`;
  // `ResourceLogs.resource=1, scope_logs=2`; `ScopeLogs.log_records=2`;
  // `LogRecord.time_unix_nano=1 (fixed64), severity_number=2 (varint),
  // severity_text=3, body=5 (AnyValue), attributes=6, flags=8 (fixed32),
  // trace_id=9 (bytes), span_id=10 (bytes),
  // observed_time_unix_nano=11 (fixed64)`.

  final case class OtlpLogRecord(timeUnixNano: Long,
                                 observedTimeUnixNano: Long,
                                 severityNumber: Long, severityText: String,
                                 body: String,
                                 traceId: String, spanId: String,
                                 attributes: Seq[OtlpKV])
  final case class OtlpScopeLogs(logRecords: Seq[OtlpLogRecord])
  final case class OtlpResourceLogs(resource: OtlpResource,
                                    scopeLogs: Seq[OtlpScopeLogs])
  final case class OtlpLogsRequest(resourceLogs: Seq[OtlpResourceLogs])

  def decodeOtlpLogsRequest(bytes: Array[Byte]): OtlpLogsRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val rls = Seq.newBuilder[OtlpResourceLogs]
    while (r.hasRemaining) {
      val tag = r.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val (off, len) = r.bytes()
        rls += decodeResourceLogs(bytes, off, len)
      } else r.skip((tag & 7).toInt)
    }
    OtlpLogsRequest(rls.result())
  }

  private def decodeResourceLogs(buf: Array[Byte], off: Int, len: Int): OtlpResourceLogs = {
    val r = new Reader(buf, off, off + len)
    var resource = OtlpResource(Nil)
    val scopes = Seq.newBuilder[OtlpScopeLogs]
    while (r.hasRemaining) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val attrs = Seq.newBuilder[OtlpKV]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val (ko, kl) = rr.bytes()
              attrs += decodeKeyValue(buf, ko, kl)
            } else rr.skip((t & 7).toInt)
          }
          resource = OtlpResource(attrs.result())
        case (2, 2) =>
          val (o, l) = r.bytes()
          val rr = new Reader(buf, o, o + l)
          val recs = Seq.newBuilder[OtlpLogRecord]
          while (rr.hasRemaining) {
            val t = rr.varint()
            if ((t >> 3) == 2 && (t & 7) == 2) {
              val (lo, ll) = rr.bytes()
              recs += decodeLogRecord(buf, lo, ll)
            } else rr.skip((t & 7).toInt)
          }
          scopes += OtlpScopeLogs(recs.result())
        case (_, w) => r.skip(w)
      }
    }
    OtlpResourceLogs(resource, scopes.result())
  }

  private def decodeLogRecord(buf: Array[Byte], off: Int, len: Int): OtlpLogRecord = {
    val r = new Reader(buf, off, off + len)
    var time = 0L; var observed = 0L; var sevN = 0L
    var sevT = ""; var body = ""; var traceId = ""; var spanId = ""
    val attrs = Seq.newBuilder[OtlpKV]
    while (r.hasRemaining) {
      val t = r.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 1) => time = r.fixed64()
        case (2, 0) => sevN = r.varint()
        case (3, 2) => sevT = r.string()
        case (5, 2) =>
          val (o, l) = r.bytes()
          body = decodeAnyValue(buf, o, l)
        case (6, 2) =>
          val (o, l) = r.bytes()
          attrs += decodeKeyValue(buf, o, l)
        case (9, 2) =>
          val (o, l) = r.bytes()
          traceId = hex(java.util.Arrays.copyOfRange(buf, o, o + l))
        case (10, 2) =>
          val (o, l) = r.bytes()
          spanId = hex(java.util.Arrays.copyOfRange(buf, o, o + l))
        case (11, 1) => observed = r.fixed64()
        case (_, w) => r.skip(w)
      }
    }
    OtlpLogRecord(time, observed, sevN, sevT, body, traceId, spanId, attrs.result())
  }

  /** Distributed OTLP logs wire decode: binary `ExportLogsServiceRequest`
    * payloads → the struct shape [[Decode.otlpLogs]] consumes. Per-split
    * flatMap, no shuffle.
    */
  def decodeOtlpLogFrames(df: org.apache.spark.sql.DataFrame,
                          bytesCol: String = "payload"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(bytesCol)).as[Array[Byte]]
      .map(bytes => decodeOtlpLogsRequest(bytes))
      .toDF()
  }

  /** Encode (tests + sink payloads): inverse of [[decodeOtlpLogsRequest]]
    * for the fields this library reads.
    */
  def encodeOtlpLogsRequest(req: OtlpLogsRequest): Array[Byte] = {
    def kv(w: Writer, field: Int, k: OtlpKV): Unit = {
      val kw = new Writer
      kw.str(1, k.key)
      val vw = new Writer
      vw.str(1, k.value)
      kw.msg(2, vw)
      w.msg(field, kw)
    }
    val w = new Writer
    req.resourceLogs.foreach { rl =>
      val rw = new Writer
      val resw = new Writer
      rl.resource.attributes.foreach(kv(resw, 1, _))
      rw.msg(1, resw)
      rl.scopeLogs.foreach { sl =>
        val slw = new Writer
        sl.logRecords.foreach { rec =>
          val lw = new Writer
          lw.fixed64(1, rec.timeUnixNano)
          lw.varintField(2, rec.severityNumber)
          if (rec.severityText.nonEmpty) lw.str(3, rec.severityText)
          if (rec.body != null) {
            val bw = new Writer
            bw.str(1, rec.body)
            lw.msg(5, bw)
          }
          rec.attributes.foreach(kv(lw, 6, _))
          if (rec.traceId.nonEmpty) lw.bytesField(9, unhex(rec.traceId))
          if (rec.spanId.nonEmpty) lw.bytesField(10, unhex(rec.spanId))
          lw.fixed64(11, rec.observedTimeUnixNano)
          slw.msg(2, lw)
        }
        rw.msg(2, slw)
      }
      w.msg(1, rw)
    }
    w.result()
  }

  // ---- shared minimal proto plumbing ---------------------------------

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private final class Reader(buf: Array[Byte], var pos: Int, end: Int) {
    private def need(n: Int): Unit =
      // n < 0 guards a hostile varint length whose low 32 bits are
      // negative (found by the codec fuzz spec); `pos > end - n` is the
      // overflow-safe form of `pos + n > end` — a near-MaxValue n would
      // wrap pos + n negative and pass the naive check
      if (n < 0 || pos > end - n) throw new IllegalArgumentException(
        s"truncated protobuf: need $n bytes at $pos, end $end")
    def hasRemaining: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      var more = true
      while (more) {
        need(1)
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
        if (shift > 70) throw new IllegalArgumentException("varint too long")
      }
      out
    }
    def fixed64(): Long = {
      need(8)
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }
    def bytes(): (Int, Int) = {
      val len = varint().toInt
      need(len)
      val off = pos; pos += len
      (off, len)
    }
    def bytesCopy(): Array[Byte] = {
      val (o, l) = bytes()
      java.util.Arrays.copyOfRange(buf, o, o + l)
    }
    def string(): String = {
      val (o, l) = bytes()
      new String(buf, o, l, UTF_8)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => need(8); pos += 8
      case 2 => bytes(); ()
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    private def vint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wireType: Int): Unit = vint((field.toLong << 3) | wireType)
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); vint(v) }
    /** sint32/sint64 zigzag field. */
    def sintField(field: Int, v: Long): Unit = {
      tag(field, 0); vint((v << 1) ^ (v >> 63))
    }
    /** Un-tagged varint — the element encoding inside a packed repeated
      * varint field.
      */
    def rawVarint(v: Long): Unit = vint(v)
    def fixed64(field: Int, v: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def str(field: Int, s: String): Unit = bytesField(field, s.getBytes(UTF_8))
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); vint(b.length.toLong); out.write(b)
    }
    def msg(field: Int, w: Writer): Unit = bytesField(field, w.result())
    /** Un-tagged little-endian 64-bit word — the element encoding inside
      * a packed repeated fixed64/double field.
      */
    def rawFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    /** Alias of [[msg]] for packed-payload writers (reads better at call
      * sites that pack raw words, not submessages).
      */
    def msgBytes(field: Int, w: Writer): Unit = bytesField(field, w.result())
    def result(): Array[Byte] = out.toByteArray
  }
}
