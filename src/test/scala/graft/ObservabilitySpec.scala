package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HttpLogPipeline
import graft.telemetry.Observability

/** Observed metrics ride the flagship batch plan and the streaming totals —
  * the engine-native analog of the reference's Prometheus counters
  * (telemetry.rs), asserted against independently derivable counts.
  */
class ObservabilitySpec extends AnyFunSuite with SparkTestBase {

  test("a00 flagship exposes rows/bytes/5xx metrics matching its own output") {
    val df = Queries.all.find(_.name == "a00_pipeline_e2e").get.fn(spark, sfDir)
    val out = df.collect()
    val m = df.queryExecution.observedMetrics(Observability.MetricsName)
    // the observation point is the post-dedup log rows the totals aggregate,
    // so the aggregated output itself is the oracle for the metrics
    val rows = out.map(_.getAs[Long]("requests")).sum
    val bytes = out.map(_.getAs[Long]("total_bytes")).sum
    val errs = out.filter(_.getAs[Int]("response_status") >= 500)
      .map(_.getAs[Long]("requests")).sum
    assert(m.getAs[Long]("rows") == rows)
    assert(m.getAs[Long]("bytes") == bytes)
    assert(m.getAs[Long]("server_errors") == errs)
    assert(rows > 0 && bytes > 0)
  }

  test("streaming totals report the same observed metrics per progress") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[StreamLog]
    val observed = Observability.observedLogs(HttpLogPipeline.anonymize(ms.toDF()))
    val totals = HttpLogPipeline.windowedTotals(
      HttpLogPipeline.withEventTimeBounds(observed))
    val q = totals.writeStream.format("memory").queryName("obs_totals")
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
      import scala.jdk.CollectionConverters._
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(Observability.MetricsName)))
      val m = metrics.find(_.getAs[Long]("rows") > 0).get
      assert(m.getAs[Long]("rows") == 3)
      assert(m.getAs[Long]("bytes") == 750)
      assert(m.getAs[Long]("server_errors") == 1)
    } finally q.stop()
  }
}
