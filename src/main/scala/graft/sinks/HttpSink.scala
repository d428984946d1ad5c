package graft.sinks

import graft.sources.WireCodecs
import graft.sources.WireCodecs.{PromLabel, PromSample, PromSeries, PromWriteRequest}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.Base64

/** Outbound HTTP transports for the payload encoders in [[Encode]] — the
  * client half of the reference's elasticsearch / pagerduty / prometheus
  * outputs (`/root/reference/src/clojure/mirabelle/output/{elasticsearch,
  * pagerduty,prometheus}.clj`). The reference runs one async client on a
  * single node; the distributed analog POSTs from `foreachPartition` on the
  * executors — the driver never materializes the frame, and throughput
  * scales with partition count. Delivery is at-least-once: a batch that
  * exhausts its retry budget throws, failing the Spark task so the task
  * retry (then the job) surfaces the outage, mirroring the reference's
  * batcher flush-or-log contract (`output/batch.clj:40-80`).
  *
  * Each sink takes the frame LAST (`HttpSink.elasticsearch(cfg, "idx")` is
  * a `DataFrame => Unit`), so a configured transport drops straight into
  * `EngineCtx.outputs` for `output!` routing.
  */
object HttpSink {

  /** Serializable transport config; executors build their own clients.
    * `url` is the full endpoint (e.g. `http://es:9200/_bulk`,
    * `https://events.pagerduty.com/v2/enqueue`, `http://prom:9090/api/v1/
    * write`). `basicAuth` mirrors the reference's elasticsearch option
    * (`output/elasticsearch.clj:48,92-96`).
    */
  final case class Http(url: String,
                        headers: Map[String, String] = Map.empty,
                        basicAuth: Option[(String, String)] = None,
                        maxRetries: Int = 3,
                        backoffMs: Long = 200,
                        timeoutMs: Long = 10000)

  /** One JVM-wide client (per executor); connections pool inside it. */
  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** POST one body; 2xx = success. Retries IOExceptions, 5xx, 408 and 429
    * with exponential backoff; any other 4xx is a permanently-invalid
    * request that resending cannot fix, so it fails immediately (no point
    * multiplying doomed sends through task retries). Exhausted retries
    * throw — task failure is the backpressure.
    */
  def post(cfg: Http, body: Array[Byte], contentType: String): Unit = {
    val b = HttpRequest.newBuilder(URI.create(cfg.url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
      .header("Content-Type", contentType)
    cfg.headers.foreach { case (k, v) => b.header(k, v) }
    cfg.basicAuth.foreach { case (u, p) =>
      b.header("Authorization", "Basic " +
        Base64.getEncoder.encodeToString(s"$u:$p".getBytes(UTF_8)))
    }
    val req = b.POST(HttpRequest.BodyPublishers.ofByteArray(body)).build()
    var attempt = 0
    var lastErr: String = ""
    var retryable = true
    while (retryable && attempt <= cfg.maxRetries) {
      if (attempt > 0) Thread.sleep(cfg.backoffMs << (attempt - 1))
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code / 100 == 2) return
        lastErr = s"HTTP $code: ${resp.body().take(200)}"
        if (code / 100 == 4 && code != 408 && code != 429) retryable = false
      } catch { case e: java.io.IOException => lastErr = e.toString }
      attempt += 1
    }
    throw new java.io.IOException(
      s"POST ${cfg.url} failed after $attempt attempt(s): $lastErr")
  }

  /** Elasticsearch `_bulk` (`output/elasticsearch.clj:173-176`): ndjson
    * batches of `bulkSize` events per request, built by
    * [[Encode.elasticsearchBulk]], POSTed per executor partition.
    */
  def elasticsearch(cfg: Http, index: String,
                    datePattern: Option[String] = Some("yyyy-MM-dd"),
                    bulkSize: Int = 500)(df: DataFrame): Unit =
    Encode.elasticsearchBulk(df, index, datePattern).select("bulk")
      .foreachPartition { (it: Iterator[Row]) =>
        it.map(_.getString(0)).grouped(bulkSize).foreach { batch =>
          post(cfg, batch.mkString.getBytes(UTF_8), "application/x-ndjson")
        }
      }

  /** PagerDuty v2 events API (`output/pagerduty.clj:17,26-36`): one JSON
    * body per event from [[Encode.pagerduty]].
    */
  def pagerduty(cfg: Http, routingKey: String, sourceKey: String,
                summaryKeys: Seq[String], dedupKeys: Seq[String])(df: DataFrame): Unit =
    Encode.pagerduty(df, routingKey, sourceKey, summaryKeys, dedupKeys)
      .select("pd_body").foreachPartition { (it: Iterator[Row]) =>
        it.foreach(r => post(cfg, r.getString(0).getBytes(UTF_8), "application/json"))
      }

  /** Prometheus remote-write (`output/prometheus.clj:16-27`): snappy-framed
    * protobuf WriteRequests of ≤ `seriesPerRequest` series, with the
    * reference's exact headers. The protobuf bytes come from the same
    * hand-rolled codec the ingestion gate decodes with, so the pair is
    * round-trip-tested end to end.
    */
  def prometheus(cfg: Http, seriesPerRequest: Int = 500)(df: DataFrame): Unit = {
    val wire = cfg.copy(headers = cfg.headers ++ Map(
      "Content-Encoding" -> "snappy",
      "X-Prometheus-Remote-Write-Version" -> "0.1.0"))
    Encode.prometheusWriteRequests(Encode.prometheusSeries(df), seriesPerRequest)
      .foreachPartition { (it: Iterator[Row]) =>
        it.foreach { row =>
          val ts = row.getSeq[Row](row.fieldIndex("timeseries")).map { s =>
            PromSeries(
              s.getSeq[Row](0).map(l => PromLabel(l.getString(0), l.getString(1))),
              s.getSeq[Row](1).map(p => PromSample(p.getDouble(0), p.getLong(1))))
          }
          val body = org.xerial.snappy.Snappy.compress(
            WireCodecs.encodePromWriteRequest(PromWriteRequest(ts)))
          post(wire, body, "application/x-protobuf")
        }
      }
  }

  /** Streaming twin for any of the sinks: `stream(df, cp)(HttpSink
    * .elasticsearch(cfg, "idx"))` ships each micro-batch through the same
    * at-least-once transport (the reference's 1000-events/5-s batcher
    * becomes the trigger interval).
    */
  def stream(df: DataFrame, checkpoint: String)(write: DataFrame => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) => write(batch))
      .start()
}
