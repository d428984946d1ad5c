package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Riemann protocol codec — proto2 wire format, implemented directly.
  *
  * The reference ingests length-prefixed protobuf `Msg` frames over TCP
  * (`/root/reference/src/clojure/mirabelle/transport/tcp.clj:28-35`
  * int32 frame, `transport/codec.clj:40-62` decode). The schema is the
  * public Riemann protocol (`/root/reference/src/java/proto/riemann/proto.proto`):
  *
  * {{{
  * message Event {
  *   optional int64  time = 1;          // seconds
  *   optional string state = 2;  service = 3;  host = 4;  description = 5;
  *   repeated string tags = 7;
  *   optional float  ttl = 8;
  *   repeated Attribute attributes = 9; // {required string key=1; optional string value=2}
  *   optional int64  time_micros = 10;  // microseconds (preferred over time)
  *   optional sint64 metric_sint64 = 13; optional double metric_d = 14; optional float metric_f = 15;
  * }
  * message Msg { optional bool ok = 2; optional string error = 3; repeated Event events = 6; }
  * }}}
  *
  * No generated protobuf classes exist in this build, so the wire format
  * (varint / zigzag / fixed32 / fixed64 / length-delimited — the public
  * protobuf encoding spec) is parsed by hand. Decoding is a genuine
  * per-row imperative kernel (branchy byte parsing), so it runs as a
  * typed `Dataset.flatMap` — distributed, one pass, no driver
  * involvement — rather than Column algebra.
  *
  * Semantics mirrored from `transport/codec.clj`:
  *  - time: `time_micros * 1000` ns if present, else `time * 1e9` ns
  *    (`decode-pb-time`, codec.clj:30-37); no wall-clock fallback here —
  *    absent time decodes as null (a library must stay deterministic).
  *  - metric precedence: sint64, then double, then float
  *    (`decode-pb-metric`, codec.clj:12-19).
  *  - host folds into `attributes` alongside the attribute list
  *    (`decode-pb-event`, codec.clj:40-53).
  */
object RiemannCodec {

  /** Decoded event row; `null` time encodes "absent" (kept as -1 sentinel
    * nowhere — Option encodes to a nullable column).
    */
  final case class RiemannEvent(
      time: Option[Long],
      state: Option[String],
      service: Option[String],
      description: Option[String],
      tags: Seq[String],
      ttl: Option[Float],
      metric: Option[Double],
      attributes: Map[String, String])

  // ---- wire-format primitives (protobuf encoding spec) ----

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    // every read is bounds-checked against the enclosing message's END,
    // not the buffer: a corrupt nested length field must fail as a parse
    // error, never silently read a sibling's bytes (this parses untrusted
    // network input)
    private def need(n: Int): Unit =
      if (n < 0 || pos > end - n)
        throw new IllegalArgumentException(
          s"truncated or corrupt message: need $n bytes at offset $pos (end $end)")
    def hasRemaining: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed32(): Int = {
      need(4)
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      need(8)
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(): (Int, Int) = { // (offset, length) view — no copy
      val len = varint()
      if (len < 0 || len > Int.MaxValue) throw new IllegalArgumentException(s"bad length $len")
      need(len.toInt)
      val off = pos
      pos += len.toInt
      (off, len.toInt)
    }
    def string(): String = {
      val (off, len) = bytes(); new String(buf, off, len, UTF_8)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 => val (_, _) = bytes()
      case 5 => need(4); pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  private def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def decodeAttribute(buf: Array[Byte], off: Int, len: Int): (String, String) = {
    val r = new Reader(buf, off, off + len)
    var key: String = null; var value: String = null
    while (r.hasRemaining) {
      val tag = r.varint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => key = r.string()
        case (2, 2) => value = r.string()
        case (_, wt) => r.skip(wt)
      }
    }
    (key, value)
  }

  private def decodeEvent(buf: Array[Byte], off: Int, len: Int): RiemannEvent = {
    val r = new Reader(buf, off, off + len)
    var timeS, timeUs: Option[Long] = None
    var state, service, host, description: Option[String] = None
    var ttl: Option[Float] = None
    var mSint: Option[Long] = None; var mD: Option[Double] = None; var mF: Option[Float] = None
    val tags = Seq.newBuilder[String]
    val attrs = Map.newBuilder[String, String]
    while (r.hasRemaining) {
      val tag = r.varint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 0)  => timeS = Some(r.varint())
        case (2, 2)  => state = Some(r.string())
        case (3, 2)  => service = Some(r.string())
        case (4, 2)  => host = Some(r.string())
        case (5, 2)  => description = Some(r.string())
        case (7, 2)  => tags += r.string()
        case (8, 5)  => ttl = Some(java.lang.Float.intBitsToFloat(r.fixed32()))
        case (9, 2)  => val (o, l) = r.bytes(); attrs += decodeAttribute(buf, o, l)
        case (10, 0) => timeUs = Some(r.varint())
        case (13, 0) => mSint = Some(zigzag(r.varint()))
        case (14, 1) => mD = Some(java.lang.Double.longBitsToDouble(r.fixed64()))
        case (15, 5) => mF = Some(java.lang.Float.intBitsToFloat(r.fixed32()))
        case (_, wt) => r.skip(wt)
      }
    }
    RiemannEvent(
      // decode-pb-time (codec.clj:30-37): µs preferred, else seconds → ns
      time = timeUs.map(_ * 1000L).orElse(timeS.map(_ * 1000000000L)),
      state = state,
      service = service,
      description = description,
      tags = tags.result(),
      ttl = ttl,
      // decode-pb-metric (codec.clj:12-19): sint64 > double > float
      metric = mSint.map(_.toDouble).orElse(mD).orElse(mF.map(_.toDouble)),
      // decode-pb-event (codec.clj:40-53): host joins the attribute map
      attributes = host.map("host" -> _).toMap ++ attrs.result())
  }

  /** Decode one `Msg` payload (NO length prefix) → its events. */
  def decodeMsg(payload: Array[Byte]): Seq[RiemannEvent] = {
    val r = new Reader(payload, 0, payload.length)
    val events = Seq.newBuilder[RiemannEvent]
    while (r.hasRemaining) {
      val tag = r.varint().toInt
      (tag >>> 3, tag & 7) match {
        case (6, 2)  => val (o, l) = r.bytes(); events += decodeEvent(payload, o, l)
        case (_, wt) => r.skip(wt) // ok / error / states / query — not events
      }
    }
    events.result()
  }

  /** Split a TCP byte stream into `Msg` payloads: each frame is a 4-byte
    * big-endian length then that many payload bytes
    * (`tcp.clj:28-35` `LengthFieldBasedFrameDecoder(MAX, 0, 4, 0, 4)`).
    */
  def frames(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var p = 0
    while (p + 4 <= stream.length) {
      val len = ((stream(p) & 0xff) << 24) | ((stream(p + 1) & 0xff) << 16) |
        ((stream(p + 2) & 0xff) << 8) | (stream(p + 3) & 0xff)
      // len is a signed read — reject negative/overflowing headers before
      // the addition below can wrap around
      require(len >= 0 && len <= stream.length - p - 4,
        s"truncated frame at offset $p (len $len)")
      out += java.util.Arrays.copyOfRange(stream, p + 4, p + 4 + len)
      p += 4 + len
    }
    require(p == stream.length, s"trailing ${stream.length - p} bytes are not a frame header")
    out.result()
  }

  // ---- encoder (for sinks, fixtures, and round-trip gates) ----

  private final class Writer {
    private val out = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wireType: Int): Unit = varint((field << 3) | wireType)
    def str(field: Int, s: String): Unit = {
      val b = s.getBytes(UTF_8); tag(field, 2); varint(b.length); out.write(b, 0, b.length)
    }
    def fixed32(field: Int, v: Int): Unit = {
      tag(field, 5)
      out.write(v & 0xff); out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def fixed64(field: Int, v: Long): Unit = {
      tag(field, 1)
      var i = 0; while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def nested(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b, 0, b.length) }
    def result(): Array[Byte] = out.toByteArray
  }

  private def encodeEvent(e: RiemannEvent): Array[Byte] = {
    val w = new Writer()
    // canonical field order = field-number order, matching protobuf
    // serializers' conventional output
    e.time.foreach { ns => w.tag(1, 0); w.varint(ns / 1000000000L) }
    e.state.foreach(w.str(2, _))
    e.service.foreach(w.str(3, _))
    e.attributes.get("host").foreach(w.str(4, _))
    e.description.foreach(w.str(5, _))
    e.tags.foreach(w.str(7, _))
    e.ttl.foreach(t => w.fixed32(8, java.lang.Float.floatToIntBits(t)))
    e.attributes.toSeq.filter(_._1 != "host").sortBy(_._1).foreach { case (k, v) =>
      val a = new Writer(); a.str(1, k); if (v != null) a.str(2, v)
      w.nested(9, a.result())
    }
    e.time.foreach { ns => w.tag(10, 0); w.varint(ns / 1000L) }
    // metric as double (the reference emits metric_d for fractional values)
    e.metric.foreach(m => w.fixed64(14, java.lang.Double.doubleToLongBits(m)))
    w.result()
  }

  /** Encode events as one `Msg` payload (no length prefix). `ok`/`error`
    * are the ACK fields the TCP server answers frames with
    * (`transport.clj:149-159`).
    */
  def encodeMsg(events: Seq[RiemannEvent], ok: Option[Boolean] = None,
                error: Option[String] = None): Array[Byte] = {
    val w = new Writer()
    ok.foreach { b => w.tag(2, 0); w.varint(if (b) 1 else 0) }
    error.foreach(e => w.str(3, e))
    events.foreach(e => w.nested(6, encodeEvent(e)))
    w.result()
  }

  /** Decode a `Msg`'s ACK fields (ok, error) — the client side of the
    * sync-ack exchange.
    */
  def decodeAck(payload: Array[Byte]): (Option[Boolean], Option[String]) = {
    val r = new Reader(payload, 0, payload.length)
    var ok: Option[Boolean] = None
    var error: Option[String] = None
    while (r.hasRemaining) {
      val tag = r.varint().toInt
      (tag >>> 3, tag & 7) match {
        case (2, 0)  => ok = Some(r.varint() != 0L)
        case (3, 2)  => error = Some(r.string())
        case (_, wt) => r.skip(wt)
      }
    }
    (ok, error)
  }

  /** Prefix a payload with the 4-byte big-endian frame header. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](payload.length + 4)
    out(0) = (payload.length >>> 24).toByte; out(1) = (payload.length >>> 16).toByte
    out(2) = (payload.length >>> 8).toByte; out(3) = payload.length.toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  // ---- Spark surface ----

  /** `Msg` payloads (binary column, one whole Msg per row) → event rows.
    * Distributed flatMap; each task decodes its partition's payloads.
    */
  def decodeMsgs(df: DataFrame, payloadCol: String = "payload"): Dataset[RiemannEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(payloadCol)).as[Array[Byte]].flatMap(decodeMsg(_))
  }

  /** Raw TCP byte streams (binary column, one connection's bytes per row)
    * → event rows: framing split + Msg decode in one distributed pass.
    */
  def decodeStreams(df: DataFrame, streamCol: String = "stream"): Dataset[RiemannEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(streamCol)).as[Array[Byte]].flatMap(frames(_).flatMap(decodeMsg))
  }
}
