package graft

import graft.sources.RiemannCodec
import graft.sources.RiemannCodec.RiemannEvent
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format parity for the Riemann protobuf codec, pinned against
  * hand-computed golden bytes (proto2 encoding spec + field numbers from
  * `/root/reference/src/java/proto/riemann/proto.proto`), so the
  * round-trip correctness gate can't hide a symmetric encode/decode bug.
  */
class RiemannCodecSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // Event { time=2, state="ok", service="api", host="h1", tags=["a"],
  //         ttl=120.0f, attributes=[{key:"k", value:"v"}], metric_sint64=-3 }
  private val goldenEvent = bytes(
    0x08, 0x02, // field 1 varint: time = 2 s
    0x12, 0x02, 'o', 'k', // field 2: state
    0x1a, 0x03, 'a', 'p', 'i', // field 3: service
    0x22, 0x02, 'h', '1', // field 4: host
    0x3a, 0x01, 'a', // field 7: tags[0]
    0x45, 0x00, 0x00, 0xf0, 0x42, // field 8 fixed32: ttl = 120.0f (0x42F00000 LE)
    0x4a, 0x06, 0x0a, 0x01, 'k', 0x12, 0x01, 'v', // field 9: Attribute{k,v}
    0x68, 0x05 // field 13 varint: metric_sint64 = -3 (zigzag 5)
  )

  // Msg { ok=true, events=[goldenEvent] }
  private val goldenMsg =
    bytes(0x10, 0x01, 0x32, goldenEvent.length) ++ goldenEvent

  test("decode golden Msg bytes: every field, zigzag, fixed32, host fold") {
    val evs = RiemannCodec.decodeMsg(goldenMsg)
    assert(evs.size == 1)
    val e = evs.head
    assert(e.time.contains(2L * 1000000000L)) // s → ns
    assert(e.state.contains("ok"))
    assert(e.service.contains("api"))
    assert(e.description.isEmpty)
    assert(e.tags == Seq("a"))
    assert(e.ttl.contains(120.0f))
    assert(e.metric.contains(-3.0)) // zigzag(5) = -3
    // decode-pb-event (codec.clj:40-53): host folds into attributes
    assert(e.attributes == Map("host" -> "h1", "k" -> "v"))
  }

  test("metric precedence: sint64 > double > float (codec.clj:12-19)") {
    def metricOf(payload: Array[Byte]): Option[Double] = {
      val msg = bytes(0x32, payload.length) ++ payload
      RiemannCodec.decodeMsg(msg).head.metric
    }
    val sint = bytes(0x68, 0x08) // metric_sint64 = 4
    val dbl = bytes(0x71, 0, 0, 0, 0, 0, 0, 0x08, 0x40) // metric_d = 3.0 (field 14 fixed64)
    val flt = bytes(0x7d, 0x00, 0x00, 0x00, 0x40) // metric_f = 2.0f (field 15 fixed32)
    assert(metricOf(flt).contains(2.0))
    assert(metricOf(dbl ++ flt).contains(3.0))
    assert(metricOf(sint ++ dbl ++ flt).contains(4.0))
  }

  test("time precedence: time_micros over time (codec.clj:30-37)") {
    // time = 2 s, time_micros = 5_000_001 µs (varint 0xC1 0x96 0xB1 0x02)
    val payload = bytes(0x08, 0x02, 0x50, 0xc1, 0x96, 0xb1, 0x02)
    val msg = bytes(0x32, payload.length) ++ payload
    assert(RiemannCodec.decodeMsg(msg).head.time.contains(5000001000L))
  }

  test("unknown fields are skipped (forward compatibility)") {
    // state message (field 4 of Msg, length-delimited) + a bogus varint
    // field 99 inside the event must not break decode
    val evPayload = bytes(0x08, 0x01, 99 << 3 | 0, 0x7f)
    val msg = bytes(0x22, 0x02, 0x08, 0x05) ++ // Msg.states[0] — skipped
      bytes(0x32, evPayload.length) ++ evPayload
    val evs = RiemannCodec.decodeMsg(msg)
    assert(evs.size == 1 && evs.head.time.contains(1000000000L))
  }

  test("encode emits the golden byte layout for the same logical event") {
    val e = RiemannEvent(
      time = Some(2L * 1000000000L), state = Some("ok"), service = Some("api"),
      description = None, tags = Seq("a"), ttl = Some(120.0f), metric = None,
      attributes = Map("host" -> "h1", "k" -> "v"))
    // the encoder writes time_micros (field 10) after the attributes and
    // always uses metric_d, so compare the prefix through the attribute
    // block: fields 1..9 = goldenEvent minus its trailing metric pair
    val enc = RiemannCodec.encodeMsg(Seq(e), ok = Some(true))
    assert(enc.take(3).sameElements(bytes(0x10, 0x01, 0x32))) // ok=true, events tag
    assert(enc.slice(4, 4 + 31).sameElements(goldenEvent.take(31)))
  }

  test("frame split + multi-Msg round trip with unicode and empty fields") {
    val e1 = RiemannEvent(Some(1500000000L), Some("critical"), Some("svc-€"),
      Some("désc 🚀"), Seq("x", "y", "z"), Some(60.5f), Some(math.Pi),
      Map("host" -> "h-ü", "région" -> "eu"))
    val e2 = RiemannEvent(None, None, None, None, Nil, None, Some(-42.0), Map.empty)
    val stream =
      RiemannCodec.frame(RiemannCodec.encodeMsg(Seq(e1))) ++
        RiemannCodec.frame(RiemannCodec.encodeMsg(Seq(e2), ok = Some(false)))
    val payloads = RiemannCodec.frames(stream)
    assert(payloads.size == 2)
    val decoded = payloads.flatMap(RiemannCodec.decodeMsg)
    // time round-trips at µs precision (encoder emits time_micros)
    assert(decoded(0) == e1.copy(time = Some(1500000000L / 1000 * 1000)))
    assert(decoded(1) == e2)
  }

  test("truncated frame and trailing garbage are rejected") {
    val good = RiemannCodec.frame(RiemannCodec.encodeMsg(Nil))
    // frame header claims 5 payload bytes, only 2 present
    intercept[IllegalArgumentException](RiemannCodec.frames(bytes(0, 0, 0, 5, 1, 2)))
    // 2 trailing bytes that are not a complete frame header
    intercept[IllegalArgumentException](RiemannCodec.frames(good ++ bytes(1, 2)))
  }

  test("corrupt nested length fields fail as parse errors, never read sibling bytes") {
    // event (field 6) whose declared length is 4, but whose inner string
    // field claims 10 bytes — must throw, not absorb the next event
    val corrupt = bytes(0x32, 0x04, 0x12, 0x0a, 'o', 'k')
    val e1 = intercept[IllegalArgumentException](RiemannCodec.decodeMsg(corrupt))
    assert(e1.getMessage.contains("truncated or corrupt"))
    // varint truncated at the end of the payload: parse error, not
    // ArrayIndexOutOfBoundsException
    val e2 = intercept[IllegalArgumentException](RiemannCodec.decodeMsg(bytes(0x08, 0x80)))
    assert(e2.getMessage.contains("truncated or corrupt"))
    // frame header with the sign bit set: clean rejection
    val e3 = intercept[IllegalArgumentException](
      RiemannCodec.frames(bytes(0x80, 0x00, 0x00, 0x00, 0x01)))
    assert(e3.getMessage.contains("truncated frame"))
  }

  test("distributed decode: Dataset flatMap over binary streams") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evs = (1 to 100).map(i => RiemannEvent(
      Some(i * 1000000L), Some("ok"), Some(s"s$i"), None, Nil, None,
      Some(i.toDouble), Map("host" -> s"h${i % 4}")))
    val streams = evs.grouped(25)
      .map(g => RiemannCodec.frame(RiemannCodec.encodeMsg(g)))
      .map(Tuple1(_)).toSeq.toDF("stream").repartition(4)
    val out = RiemannCodec.decodeStreams(streams)
    assert(out.count() == 100)
    assert(out.selectExpr("sum(metric)").head.getDouble(0) == (1 to 100).map(_.toDouble).sum)
  }
}
