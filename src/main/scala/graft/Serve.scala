package graft

import graft.http.ControlPlane
import graft.ir.{EngineCtx, StreamRegistry}
import org.apache.spark.sql.SparkSession

/** Server entry point — the analog of the reference's boot sequence
  * (`core.clj:118-143`: read config dirs → compile streams → start HTTP):
  * load persisted stream documents from a config directory into a
  * [[StreamRegistry]], start the [[ControlPlane]], and serve until
  * terminated. Hot reload has both of the reference's surfaces:
  * add/remove over HTTP, and SIGHUP re-reading the streams directory
  * diff-wise (`core.clj:136-143` → [[StreamRegistry.reloadFrom]]);
  * `SPARK_GRAFT_PERSIST=true` writes registry changes back on shutdown.
  *
  * Environment:
  *  - `SPARK_GRAFT_STREAMS_DIR` — directory of stream JSON documents
  *    (default `./streams`, missing dir = start empty)
  *  - `SPARK_GRAFT_HTTP_PORT`   — listen port (default 5558, 0 = ephemeral)
  *  - `SPARK_GRAFT_CPUS`        — local core count (default 4)
  *  - `SPARK_GRAFT_PERSIST`    — save registry back to the streams dir on
  *    shutdown (default false)
  */
object Serve {

  /** Build the registry from a config dir and start the control plane —
    * separated from [[main]] so tests can boot and stop it in-process.
    */
  def boot(spark: SparkSession, streamsDir: String, port: Int,
           ctx: EngineCtx = EngineCtx()): (StreamRegistry, ControlPlane) = {
    val registry = new StreamRegistry(ctx)
    val loaded = registry.loadFrom(streamsDir)
    if (loaded.nonEmpty)
      System.err.println(s"[serve] loaded streams: ${loaded.mkString(", ")}")
    (registry, new ControlPlane(registry, spark, port).start())
  }

  /** SIGHUP → diff-reload of the streams directory, exactly the
    * reference's handler (`core.clj:136-143`: log, reload, never let a
    * reload failure kill the process). Returns false where the platform
    * or JVM flags don't expose signal handling (reload stays available
    * over HTTP).
    */
  def installReloadHandler(registry: StreamRegistry, streamsDir: String): Boolean =
    try {
      sun.misc.Signal.handle(new sun.misc.Signal("HUP"), (_: sun.misc.Signal) =>
        try {
          val r = registry.reloadFrom(streamsDir)
          System.err.println(s"[serve] SIGHUP reload: added=${r.added.mkString(",")} " +
            s"reloaded=${r.reloaded.mkString(",")} removed=${r.removed.mkString(",")} " +
            s"unchanged=${r.unchanged.size}")
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[serve] reload failed: ${e.getMessage}")
        })
      true
    } catch {
      case _: Throwable => false
    }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_STREAMS_DIR", "streams")
    val port = sys.env.getOrElse("SPARK_GRAFT_HTTP_PORT", "5558").toInt
    val (registry, cp) = boot(spark, dir, port)
    installReloadHandler(registry, dir)
    System.err.println(s"[serve] listening on 127.0.0.1:${cp.boundPort}")
    val done = new java.util.concurrent.CountDownLatch(1)
    sys.addShutdownHook {
      if (sys.env.get("SPARK_GRAFT_PERSIST").contains("true")) registry.saveTo(dir)
      cp.stop()
      done.countDown()
    }
    done.await()
  }
}
