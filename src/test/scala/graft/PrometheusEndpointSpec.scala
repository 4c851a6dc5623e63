package graft

import java.net.URI

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HttpLogPipeline
import graft.telemetry.{Observability, PrometheusEndpoint}

/** Scrapes the Prometheus exposition endpoint and checks the served gauges
  * against oracle-checked counts — the serving half of the reference's
  * telemetry (telemetry.rs: Prometheus registry behind HTTP).
  */
class PrometheusEndpointSpec extends AnyFunSuite with SparkTestBase {

  private def scrape(url: String): String = {
    val in = URI.create(url).toURL.openStream()
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("streaming observed metrics are served in Prometheus text format") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prom = new PrometheusEndpoint()
    prom.start()
    spark.streams.addListener(prom.listener)
    val ms = MemoryStream[StreamLog]
    val observed = Observability.observedLogs(HttpLogPipeline.anonymize(ms.toDF()))
    val totals = HttpLogPipeline.windowedTotals(
      HttpLogPipeline.withEventTimeBounds(observed))
    val q = totals.writeStream.format("memory").queryName("prom_totals")
      .outputMode("complete").start()
    try {
      ms.addData(
        StreamLog(java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 1, 200, "HIT",
          "10.0.0.7", 100, 10, 1),
        StreamLog(java.sql.Timestamp.valueOf("2024-01-01 01:20:00"), 2, 502, "MISS",
          "10.0.0.8", 250, 10, 2),
        StreamLog(java.sql.Timestamp.valueOf("2024-01-01 02:10:00"), 3, 200, "HIT",
          "10.0.0.9", 400, 10, 3))
      q.processAllAvailable()
      // the listener runs async on the listener bus; poll until it lands
      val deadline = System.nanoTime() + 10e9.toLong
      def page() = scrape(prom.endpoint)
      while (!page().contains("graft_rows") && System.nanoTime() < deadline)
        Thread.sleep(50)
      val text = page()
      assert(text.contains("# TYPE graft_rows gauge"))
      assert(text.contains("""graft_rows{observation="graft_metrics"} 3"""))
      assert(text.contains("""graft_bytes{observation="graft_metrics"} 750"""))
      assert(text.contains("""graft_server_errors{observation="graft_metrics"} 1"""))
    } finally {
      q.stop()
      spark.streams.removeListener(prom.listener)
      prom.stop()
    }
  }

  test("batch observed metrics can be recorded and scraped") {
    val prom = new PrometheusEndpoint()
    prom.start()
    try {
      val df = Queries.all.find(_.name == "a00_pipeline_e2e").get.fn(spark, sfDir)
      val out = df.collect()
      df.queryExecution.observedMetrics.foreach { case (name, row) =>
        prom.record(name, row)
      }
      val rows = out.map(_.getAs[Long]("requests")).sum
      val text = scrape(prom.endpoint)
      assert(text.contains(s"""graft_rows{observation="graft_metrics"} $rows"""))
    } finally prom.stop()
  }
}
