package graft

import graft.http.ControlPlane
import graft.ir.{EngineCtx, StreamRegistry}
import org.apache.spark.sql.SparkSession

/** Server entry point — the analog of the reference's boot sequence
  * (`core.clj:118-143`: read config dirs → compile streams → start HTTP):
  * load persisted stream documents from a config directory into a
  * [[StreamRegistry]], start the [[ControlPlane]], and serve until
  * terminated. Add/remove over HTTP is the hot-reload surface (the
  * reference's SIGHUP re-read is its restart-free analog);
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
