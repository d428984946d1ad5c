package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ir.{Node, StreamRegistry}
import graft.model.Event
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Thin HTTP control plane over [[StreamRegistry]] — the analog of the
  * reference's stream API (`src/clojure/mirabelle/handler.clj:117-135`
  * router):
  *
  *  - `GET    /api/v1/stream`        → `{"streams":[...]}`   (list-streams)
  *  - `GET    /api/v1/stream/:name`  → `{"config": b64}`     (get-stream)
  *  - `POST   /api/v1/stream/:name`  ← `{"config": b64, "default"?: bool}`
  *                                                            (add-stream)
  *  - `DELETE /api/v1/stream/:name`  → remove                 (remove-stream)
  *  - `PUT    /api/v1/stream/:name`  ← `{"events":[{...}]}`   (push-event)
  *  - `GET    /healthz` | `/health`  → `{"message":"ok"}`
  *
  * The config transport is base64 like the reference's (`b64/from-base64`
  * on add, `b64/to-base64` on get, `handler.clj:45-72`), wrapping the IR's
  * JSON documents instead of EDN. The registry IS the engine's control
  * surface; this layer only speaks HTTP — built on the JDK's HttpServer so
  * the library adds no dependency.
  *
  * Scale note: the control plane is a driver-side singleton managing
  * pipeline METADATA (add/remove/list are TrieMap operations). The
  * data-plane `PUT` route exists for reference parity and smoke pushes —
  * bulk ingestion should arrive through the real sources (files, Kafka,
  * the decode flatMaps), not per-request HTTP bodies.
  */
final class ControlPlane(registry: StreamRegistry, spark: SparkSession, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var eventSeq = 0L

  def boundPort: Int = server.getAddress.getPort

  def start(): ControlPlane = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // control plane: serial is fine
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  // ------------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod
    try {
      (method, path.split("/").toList.filter(_.nonEmpty)) match {
        case ("GET", List("healthz")) | ("GET", List("health")) =>
          respond(ex, 200, """{"message":"ok"}""")
        case ("GET", List("api", "v1", "stream")) =>
          respond(ex, 200,
            registry.list.map(jstr).mkString("""{"streams":[""", ",", "]}"))
        case ("GET", List("api", "v1", "stream", name)) =>
          registry.getJson(name) match {
            case Some(doc) =>
              val b64 = Base64.getEncoder.encodeToString(doc.getBytes(UTF_8))
              respond(ex, 200, s"""{"config":${jstr(b64)}}""")
            case None => respond(ex, 404, s"""{"error":"stream not found"}""")
          }
        case ("POST", List("api", "v1", "stream", name)) =>
          val body = parse(readBody(ex))
          val config = body.get("config") match {
            case Some(c: String) => new String(Base64.getDecoder.decode(c), UTF_8)
            case _ => throw new IllegalArgumentException("missing base64 'config'")
          }
          val default = body.get("default").contains(true)
          addDecoded(name, config, default)
          respond(ex, 200, """{"message":"stream added"}""")
        case ("DELETE", List("api", "v1", "stream", name)) =>
          registry.remove(name)
          respond(ex, 200, """{"message":"stream removed"}""")
        case ("PUT", List("api", "v1", "stream", name)) =>
          val body = parse(readBody(ex))
          val events = body.get("events") match {
            case Some(xs: Seq[_]) => xs.map(e => toEvent(e.asInstanceOf[Map[String, Any]]))
            case _ => throw new IllegalArgumentException("missing 'events' array")
          }
          pushEvents(name, events)
          respond(ex, 200, """{"message":"ok"}""")
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":${jstr(Option(e.getMessage).getOrElse("bad request"))}}""")
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
    }
  }

  /** Accept either a full `{"action":"stream",...}` document or a bare
    * pipeline node as the decoded config; like the reference, the path
    * name wins over any name inside the document.
    */
  private def addDecoded(name: String, configJson: String, default: Boolean): Unit = {
    val node = Node.fromJson(configJson)
    val (pipeline, isDefault) =
      if (node.action == "stream") {
        val flagged = node.params.headOption match {
          case Some(m: Map[_, _]) =>
            m.asInstanceOf[Map[String, Any]].get("default").contains(true)
          case _ => false
        }
        val pipe = node.children match {
          case Seq(single) => single
          case many        => Node("sdo", Nil, many)
        }
        (pipe, default || flagged)
      } else (node, default)
    registry.add(name, pipeline, isDefault)
  }

  private def pushEvents(name: String, events: Seq[Event]): Unit = {
    val s = spark
    import s.implicits._
    registry.push(s.createDataset(events).toDF(), name)
  }

  /** JSON event → typed [[Event]]; absent `time` gets the wall clock like
    * the reference's `time/default-time` (`handler.clj:51-57`).
    */
  private def toEvent(m: Map[String, Any]): Event = {
    def str(k: String): Option[String] = m.get(k).collect { case s: String => s }
    def dbl(k: String): Option[Double] = m.get(k).collect {
      case d: Double => d
      case l: Long   => l.toDouble
      case i: Int    => i.toDouble
    }
    def lng(k: String): Option[Long] = m.get(k).collect {
      case l: Long   => l
      case i: Int    => i.toLong
      case d: Double => d.toLong
    }
    val id = lng("eventId").getOrElse {
      eventSeq += 1; eventSeq
    }
    Event(
      host = str("host"), service = str("service"), name = str("name"),
      state = str("state"), metric = dbl("metric"),
      time = lng("time").getOrElse(System.currentTimeMillis() * 1000000L),
      ttl = dbl("ttl"), description = str("description"),
      tags = m.get("tags").collect { case xs: Seq[_] => xs.map(_.toString) }.getOrElse(Nil),
      attributes = m.get("attributes").collect {
        case mm: Map[_, _] => mm.map { case (k, v) => k.toString -> v.toString }
      }.getOrElse(Map.empty),
      eventId = id)
  }

  // ---- minimal JSON plumbing (json4s is already on the classpath) ----

  private def parse(body: String): Map[String, Any] =
    Node.anyOf(org.json4s.jackson.JsonMethods.parse(body)) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"expected a JSON object, got $other")
    }

  private def jstr(s: String): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JString(s)))

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
