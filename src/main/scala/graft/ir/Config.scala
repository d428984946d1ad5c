package graft.ir

import org.apache.spark.sql.DataFrame

/** Reader for the reference's MAIN configuration file
  * (`config.clj:49-63` spec, `dev/resources/config.edn` shape): the
  * `:tcp`/`:http` transport sections, `:stream {:directories [...]
  * :actions {...}}`, `:outputs {name {:type ... :config {...}}}`, and
  * `:test {:directories [...]}` — so a migrating user points
  * [[graft.Serve]] at the exact file their reference deployment runs
  * today.
  *
  * Honest subset, fail-soft with WARNINGS (never a silent drop):
  *  - `tcp`: port + the key/cert/cacert PEM triple (mutual TLS);
  *    `host` other than loopback is noted (this engine binds loopback —
  *    front it with the usual ingress at deploy time).
  *  - `outputs` of `:type :file` become [[graft.sinks.FileSink]]-backed
  *    `output!` targets; other output types (and `:builder` customs)
  *    need code, not config — each yields a warning naming the
  *    `EngineCtx.outputs` hook to register instead.
  *  - `stream :actions {name symbol}` references Clojure symbols the JVM
  *    cannot resolve — warned, with the `EngineCtx.custom` hook named.
  */
object Config {

  final case class Loaded(
      httpPort: Option[Int],
      tcpPort: Option[Int],
      tls: Option[graft.http.Tls.Config],
      streamDirs: Seq[String],
      testDirs: Seq[String],
      outputs: Map[String, DataFrame => Unit],
      warnings: Seq[String],
      streaming: Seq[graft.streaming.StreamServe.QuerySpec] = Nil)

  def load(path: String): Loaded =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def parse(edn: String): Loaded = {
    val root = Edn.parse(edn) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(
        s"config root must be a map, got $other")
    }
    val warnings = Seq.newBuilder[String]
    def section(key: String): Map[String, Any] = root.get(key) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _                  => Map.empty
    }
    def port(m: Map[String, Any]): Option[Int] =
      m.get("port").map(_.asInstanceOf[Number].intValue())
    def str(v: Any): String = v match {
      case s: Edn.Secret => s.reveal.toString
      case other         => other.toString
    }

    val tcp = section("tcp")
    tcp.get("host").map(_.toString).filterNot(Set("127.0.0.1", "localhost")).foreach { h =>
      warnings += s"tcp host '$h' noted: this engine binds loopback; front it with your ingress"
    }
    val tls = (tcp.get("key"), tcp.get("cert"), tcp.get("cacert")) match {
      case (Some(k), Some(c), Some(ca)) =>
        Some(graft.http.Tls.Config(str(k), str(c), str(ca)))
      case (None, None, None) => None
      case _ =>
        throw new IllegalArgumentException(
          "partial tcp TLS config: set all of key/cert/cacert or none")
    }

    val stream = section("stream")
    def dirs(m: Map[String, Any]): Seq[String] = m.get("directories") match {
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case _                => Nil
    }
    stream.get("actions") match {
      case Some(m: Map[_, _]) if m.nonEmpty =>
        warnings += ("stream :actions reference Clojure symbols (" +
          m.asInstanceOf[Map[String, Any]].keys.mkString(", ") +
          "): register Scala equivalents via EngineCtx.custom instead")
      case _ =>
    }

    val outputs = Map.newBuilder[String, DataFrame => Unit]
    section("outputs").foreach {
      case (name, cfg: Map[_, _]) =>
        val m = cfg.asInstanceOf[Map[String, Any]]
        val conf = m.get("config").collect { case c: Map[_, _] =>
          c.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty)
        m.get("type").map(_.toString) match {
          case Some("file") =>
            val p = conf.getOrElse("path",
              throw new IllegalArgumentException(s"output '$name': file output without :path"))
            outputs += name -> ((df: DataFrame) =>
              graft.sinks.FileSink.write(df, str(p)))
          case Some(other) =>
            warnings += (s"output '$name' of type :$other needs a transport: register it " +
              "via EngineCtx.outputs (payload encoders in graft.sinks.Encode/HttpSink)")
          case None =>
            warnings += s"output '$name' has no :type (custom :builder outputs need code): skipped"
        }
      case (name, other) =>
        warnings += s"output '$name': expected a config map, got $other"
    }

    // :streaming {:queries [...]} — config-declared long-running
    // Structured Streaming queries (graft extension; the reference's
    // always-on daemon role, re-expressed as checkpointed streams)
    val (streamingSpecs, streamingWarnings) = graft.streaming.StreamServe.parse(root)
    streamingWarnings.foreach(warnings += _)

    Loaded(
      httpPort = port(section("http")),
      tcpPort = port(tcp),
      tls = tls,
      streamDirs = dirs(stream),
      testDirs = dirs(section("test")),
      outputs = outputs.result(),
      warnings = warnings.result(),
      streaming = streamingSpecs)
  }
}
