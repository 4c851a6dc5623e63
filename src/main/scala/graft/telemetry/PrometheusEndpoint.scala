package graft.telemetry

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Prometheus text exposition of [[Observability]]'s observed metrics — the
  * serving half the reference runs in `telemetry.rs:30-75` (a Prometheus
  * registry behind an HTTP endpoint). The computation half already rides the
  * queries themselves (`observe` → `observedMetrics`); this class closes the
  * loop: a [[StreamingQueryListener]] folds every
  * `StreamingQueryProgress.observedMetrics` row into a gauge map, batch
  * queries can [[record]] theirs explicitly, and an in-process HTTP server
  * renders the map at `/metrics` in Prometheus text format 0.0.4.
  *
  * Driver-side by design: observed metrics are already aggregated to the
  * driver by Spark, so serving them adds no executor traffic — the same
  * shape as the reference's single-process exposition.
  *
  * {{{
  * val prom = new PrometheusEndpoint()
  * spark.streams.addListener(prom.listener)
  * prom.start()                 // scrape prom.endpoint
  * }}}
  */
object PrometheusEndpoint {
  /** Gauge families [[PrometheusEndpoint.recordProgress]] emits (metric name
    * = `graft_<family>`). DashboardLintSpec drives a real stateful query and
    * asserts every family here actually renders, then that the grafana/
    * dashboards reference nothing outside these + the observed-metric
    * families — so the provisioned boards cannot drift from the endpoint.
    */
  val StreamFamilies: Seq[String] = Seq(
    "stream_input_rows_per_sec", "stream_processed_rows_per_sec",
    "stream_num_input_rows", "stream_batch_duration_ms",
    "stream_state_rows", "stream_state_bytes")
}

final class PrometheusEndpoint(port: Int = 0) {

  // (observation name, field) -> latest value. Gauge semantics: the newest
  // progress wins, matching the reference's IntGauge family; monotone
  // observed expressions (complete-mode counts) behave as counters.
  private val gauges = new ConcurrentHashMap[(String, String), Double]()

  /** Fold one observed-metrics row (from a streaming progress or a batch
    * `QueryExecution.observedMetrics`) into the served gauges.
    */
  def record(observation: String, row: Row): Unit = {
    val fields = row.schema.fields
    var i = 0
    while (i < fields.length) {
      row.get(i) match {
        case n: Number => gauges.put((observation, fields(i).name), n.doubleValue())
        case _ => () // non-numeric observed columns have no gauge form
      }
      i += 1
    }
  }

  /** Per-query engine health gauges from every progress update — the
    * serving analog of the reference performance dashboard's latency /
    * throughput / insert-size panels (`telemetry.rs` + the anonymizer
    * Grafana board): throughput in and out, batch latency, and the
    * stateful operators' row/byte envelope (whose flatness IS the 100 TB
    * state guarantee — StatefulFunnelSpec/StatefulRetentionSpec assert it,
    * these gauges let production watch it). Rendered with the query NAME
    * as the observation label (falls back to the run id for unnamed
    * queries), one gauge family per field; the grafana/ dashboards in this
    * repo chart exactly these families.
    */
  def recordProgress(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit = {
    val q = if (p.name != null && p.name.nonEmpty) p.name else p.id.toString
    def put(field: String, v: Double): Unit =
      if (!v.isNaN) gauges.put((q, field), v)
    put("stream_input_rows_per_sec", p.inputRowsPerSecond)
    put("stream_processed_rows_per_sec", p.processedRowsPerSecond)
    put("stream_num_input_rows", p.numInputRows.toDouble)
    put("stream_batch_duration_ms", p.batchDuration.toDouble)
    val so = p.stateOperators
    if (so != null && so.nonEmpty) {
      put("stream_state_rows", so.map(_.numRowsTotal).sum.toDouble)
      put("stream_state_bytes", so.map(_.memoryUsedBytes).sum.toDouble)
    }
  }

  /** Register on `spark.streams` to serve every query's observed metrics
    * plus the per-query health gauges above.
    */
  val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      e.progress.observedMetrics.forEach((name, row) => record(name, row))
      recordProgress(e.progress)
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  private def renderValue(v: Double): String =
    if (v == Math.floor(v) && !v.isInfinite && Math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** The metrics page: one `graft_<field>{observation="<name>"}` gauge per
    * observed column, deterministically sorted.
    */
  def render: String = {
    import scala.jdk.CollectionConverters._
    val entries = gauges.asScala.toSeq.sortBy { case ((o, f), _) => (f, o) }
    val sb = new StringBuilder
    var lastField = ""
    entries.foreach { case ((obs, field), v) =>
      val metric = s"graft_${sanitize(field)}"
      if (field != lastField) {
        sb.append(s"# TYPE $metric gauge\n")
        lastField = field
      }
      sb.append(s"""$metric{observation="${sanitize(obs)}"} ${renderValue(v)}""")
        .append('\n')
    }
    sb.toString
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/metrics", new HttpHandler {
    def handle(ex: HttpExchange): Unit = {
      val body = render.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add(
        "Content-Type", "text/plain; version=0.0.4; charset=utf-8")
      ex.sendResponseHeaders(200, body.length)
      try ex.getResponseBody.write(body) finally ex.close()
    }
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/metrics"
}
