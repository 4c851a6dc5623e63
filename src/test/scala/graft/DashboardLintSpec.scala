package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HttpLogPipeline
import graft.telemetry.{Observability, PrometheusEndpoint}

/** The provisioned Grafana boards (the JSONs under grafana/dashboards) must stay in
  * lockstep with the metrics the engine actually serves: every PromQL expr
  * may reference only gauge families [[PrometheusEndpoint]] emits, and every
  * declared stream family must really render when a stateful query runs.
  * Without this, a renamed gauge silently blanks a production panel — the
  * dashboard "works" until the night someone needs it.
  */
class DashboardLintSpec extends AnyFunSuite with SparkTestBase {

  private val mapper = new ObjectMapper()
  private val dashboardDir = new java.io.File("grafana/dashboards")

  private def dashboards: Seq[(String, JsonNode)] =
    dashboardDir.listFiles().toSeq.filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
      .map(f => f.getName -> mapper.readTree(f))

  private def exprsOf(root: JsonNode): Seq[String] = {
    val panelExprs = root.path("panels").elements().asScala.flatMap(p =>
      p.path("targets").elements().asScala.map(_.path("expr").asText(""))).toSeq
    // templating variables (label_values(...) queries) reference metrics too
    val templExprs = root.path("templating").path("list").elements().asScala
      .map(_.path("query").asText("")).toSeq
    (panelExprs ++ templExprs).filter(_.nonEmpty)
  }

  test("dashboards parse, and every panel target carries a PromQL expr") {
    val ds = dashboards
    assert(ds.map(_._1) ==
      Seq("graft_pipeline_performance.json", "graft_streaming_state.json"))
    ds.foreach { case (name, root) =>
      assert(root.path("uid").asText("").nonEmpty, s"$name: missing uid")
      assert(root.path("panels").size() > 0, s"$name: no panels")
      root.path("panels").elements().asScala.foreach { p =>
        val targets = p.path("targets")
        assert(targets.size() > 0,
          s"$name: panel '${p.path("title").asText()}' has no targets")
        targets.elements().asScala.foreach(t =>
          assert(t.path("expr").asText("").nonEmpty,
            s"$name: empty expr in panel '${p.path("title").asText()}'"))
      }
    }
  }

  test("every dashboard metric is a family the endpoint can serve; every " +
      "declared stream family really renders") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // servable set, empirically: drive a REAL stateful streaming query with
    // observed pipeline counters through the listener and scrape the render
    val prom = new PrometheusEndpoint()
    spark.streams.addListener(prom.listener)
    val ms = MemoryStream[StreamLog]
    val observed = Observability.observedLogs(HttpLogPipeline.anonymize(ms.toDF()))
    val q = HttpLogPipeline.windowedTotals(
        HttpLogPipeline.withEventTimeBounds(observed))
      .writeStream.format("memory").queryName("lint_totals")
      .outputMode("complete").start()
    val served = try {
      ms.addData(StreamLog(java.sql.Timestamp.valueOf("2024-01-01 01:10:00"),
        1, 200, "HIT", "10.0.0.7", 100, 10, 1))
      q.processAllAvailable()
      ms.addData(StreamLog(java.sql.Timestamp.valueOf("2024-01-01 01:20:00"),
        2, 502, "MISS", "10.0.0.8", 250, 10, 2))
      q.processAllAvailable()
      // listener bus is async; poll until all stream families land
      val deadline = System.nanoTime() + 10e9.toLong
      def families() =
        "graft_[a-z0-9_]+".r.findAllIn(prom.render).toSet
      var got = families()
      while (System.nanoTime() < deadline &&
          !PrometheusEndpoint.StreamFamilies.forall(f => got("graft_" + f))) {
        Thread.sleep(100); got = families()
      }
      got
    } finally {
      q.stop()
      spark.streams.removeListener(prom.listener)
    }
    PrometheusEndpoint.StreamFamilies.foreach(f =>
      assert(served("graft_" + f),
        s"declared stream family graft_$f never rendered from a live query"))
    dashboards.foreach { case (name, root) =>
      val referenced = exprsOf(root)
        .flatMap("graft_[a-z0-9_]+".r.findAllIn(_)).toSet
      assert(referenced.nonEmpty, s"$name references no graft metrics")
      val unknown = referenced -- served
      assert(unknown.isEmpty,
        s"$name references metrics the endpoint never serves: $unknown")
    }
  }
}
