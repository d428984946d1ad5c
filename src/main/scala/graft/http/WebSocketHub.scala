package graft.http

import graft.conditions.Condition
import graft.ir.{Edn, StreamResult}

import java.io.{BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import scala.jdk.CollectionConverters._

/** WebSocket transport for pubsub subscribers — the analog of the
  * reference's `transport/websocket.clj:47-119`: a client opens
  * `GET /channel/<name>?query=<base64 condition>`, the connection
  * upgrades, and every event subsequently published to that channel that
  * matches the condition arrives as one JSON text frame. `query` defaults
  * to `true` (everything), mirroring the Riemann-style default; the
  * encoded condition is the reference's EDN vocabulary (e.g.
  * `[:> :metric 100]`), read by [[Edn.parse]] and compiled by
  * [[Condition.parse]] — the same engine path `StreamResult.subscribe`
  * uses, so the wire transport adds zero new filtering semantics.
  *
  * The frame layer is hand-rolled RFC 6455 (like the repo's other wire
  * codecs): SHA-1 key accept on upgrade, unmasked server text frames,
  * masked client frames handled for close (echoed, then unregistered) and
  * ping (ponged with the same payload). No permessage extensions are
  * negotiated; binary/text frames from subscribers are ignored — this is
  * a fan-out endpoint, not an ingest one (ingest is the HTTP routes).
  *
  * Scale note: like the reference's, this is a driver-edge component —
  * events leaving through a socket are inherently collected; the bound is
  * whatever the subscriber could receive anyway, and the filtering runs
  * distributed (the condition filter is a Spark plan; only matching rows
  * are collected for the send).
  */
final class WebSocketHub(port: Int = 0) {

  private final class Sub(val channel: String, val condition: Condition,
                          val socket: Socket, val out: OutputStream) {
    val lock = new Object
  }

  private val server = new ServerSocket()
  private val subs = new java.util.concurrent.CopyOnWriteArrayList[Sub]()
  @volatile private var running = false

  def boundPort: Int = server.getLocalPort
  def subscriberCount: Int = subs.size()

  def start(): WebSocketHub = {
    server.bind(new InetSocketAddress("127.0.0.1", port))
    running = true
    val t = new Thread(() => acceptLoop(), "graft-ws-accept")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: java.io.IOException => }
    subs.asScala.foreach(s => try s.socket.close() catch { case _: java.io.IOException => })
    subs.clear()
  }

  /** Fan a stream result's published channels out to matching
    * subscribers: for each subscriber on a channel this result published
    * to, the events passing its condition are sent as JSON text frames
    * (one frame per event, in the channel frame's deterministic
    * (time, eventId) order).
    */
  def publish(result: StreamResult): Unit = {
    val channels = result.channels.keySet
    subs.asScala.filter(s => channels.contains(s.channel)).foreach { sub =>
      try {
        val rows = result.subscribe(sub.channel, sub.condition)
          .orderBy("time", "eventId")
          .toJSON.collect()
        sub.lock.synchronized { rows.foreach(j => sendText(sub.out, j)) }
      } catch {
        case _: java.io.IOException => dropSub(sub)
      }
    }
  }

  def publishAll(results: Iterable[StreamResult]): Unit = results.foreach(publish)

  // ------------------------------------------------------------ accept

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "graft-ws-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.io.IOException => // closed during accept: loop exits via `running`
      }
    }

  private def serve(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      val (path, query, headers) = readRequest(in)
      val key = headers.getOrElse("sec-websocket-key", "")
      val channel = path.split("/").toList.filter(_.nonEmpty) match {
        case List("channel", name) => name
        case _ => null
      }
      if (channel == null || key.isEmpty) {
        // the reference closes unknown paths after logging
        out.write(("HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n").getBytes(UTF_8))
        out.flush(); sock.close(); return
      }
      val condition =
        try parseQueryCondition(query)
        catch {
          case _: Exception =>
            out.write(("HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n").getBytes(UTF_8))
            out.flush(); sock.close(); return
        }
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val sub = new Sub(channel, condition, sock, out)
      subs.add(sub)
      controlLoop(in, sub) // blocks until close/EOF
    } catch {
      case _: java.io.IOException => // dropped connection
      case _: IllegalArgumentException =>
        // pre-upgrade decode failure (bad percent-encoding / base64 / EDN)
        try {
          out.write(("HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n").getBytes(UTF_8))
          out.flush()
        } catch { case _: java.io.IOException => }
    } finally {
      subs.asScala.find(_.socket eq sock).foreach(dropSub)
      try sock.close() catch { case _: java.io.IOException => }
    }
  }

  /** `query` param: base64 EDN condition; absent or `"true"` means
    * always-true (the reference maps `"true"` to `[:always-true]`).
    */
  private def parseQueryCondition(query: Map[String, String]): Condition =
    query.get("query").filter(_ != "true") match {
      case None => Condition.AlwaysTrue
      case Some(b64) =>
        Edn.parse(new String(Base64.getDecoder.decode(b64), UTF_8)) match {
          case Seq("always-true") => Condition.AlwaysTrue
          case form               => Condition.parse(form)
        }
    }

  private def readRequest(in: InputStream): (String, Map[String, String], Map[String, String]) = {
    val lines = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var prev = -1
    var c = in.read()
    while (c >= 0) {
      if (prev == '\r' && c == '\n') {
        val line = sb.toString.stripSuffix("\r")
        if (line.isEmpty) { c = -1 } // end of headers
        else { lines += line; sb.clear(); prev = -1; c = in.read() }
      } else { sb += c.toChar; prev = c; c = in.read() }
    }
    val requestLine = lines.headOption.getOrElse(throw new java.io.IOException("empty request"))
    val target = requestLine.split(" ").lift(1).getOrElse("/")
    val (path, qs) = target.indexOf('?') match {
      case -1 => (target, "")
      case i  => (target.substring(0, i), target.substring(i + 1))
    }
    val query = qs.split("&").toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        case Array(k)    => URLDecoder.decode(k, UTF_8) -> ""
      }
    }.toMap
    val headers = lines.drop(1).flatMap { l =>
      l.indexOf(':') match {
        case -1 => None
        case i  => Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
      }
    }.toMap
    (path, query, headers)
  }

  // ------------------------------------------------------------ frames

  /** Reads client frames until close/EOF: close is echoed (1000), ping is
    * ponged with the same payload, data frames are ignored.
    */
  private def controlLoop(in: InputStream, sub: Sub): Unit = {
    var open = true
    while (open) {
      readFrame(in) match {
        case None => open = false
        case Some((opcode, payload)) => opcode match {
          case 0x8 => // close: echo and finish
            sub.lock.synchronized { writeFrame(sub.out, 0x8, payload) }
            open = false
          case 0x9 => // ping → pong, same payload
            sub.lock.synchronized { writeFrame(sub.out, 0xA, payload) }
          case _ => // pong / text / binary / continuation: ignored
        }
      }
    }
  }

  /** One client frame (masked per RFC 6455 §5.3); None on EOF. */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    def byte(): Int = in.read()
    val b0 = byte(); if (b0 < 0) return None
    val b1 = byte(); if (b1 < 0) return None
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (byte().toLong << 8) | byte().toLong
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | byte().toLong; i += 1 }
    }
    if (len > (1L << 20)) throw new java.io.IOException(s"ws frame too large: $len")
    val mask = if (masked) Array.fill(4)(byte().toByte) else Array.emptyByteArray
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < payload.length) {
      val n = in.read(payload, off, payload.length - off)
      if (n < 0) return None
      off += n
    }
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1 }
    }
    Some((opcode, payload))
  }

  private def sendText(out: OutputStream, text: String): Unit =
    writeFrame(out, 0x1, text.getBytes(UTF_8))

  /** Server frames are unmasked (RFC 6455 §5.1). */
  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode)
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < 65536) { out.write(126); out.write(n >> 8); out.write(n & 0xFF) }
    else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  private def dropSub(sub: Sub): Unit = {
    subs.remove(sub)
    try sub.socket.close() catch { case _: java.io.IOException => }
  }
}
