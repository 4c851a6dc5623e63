package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Capacity, HttpLog}
import graft.streaming.HttpLogPipeline

class CapacitySpec extends AnyFunSuite with SparkTestBase {

  test("capacity estimate extrapolates from measured aggregation ratio") {
    val hl = HttpLog.view(Tables.events(spark, sfDir))
    val totals = HttpLogPipeline.windowedTotals(hl)
    // reference testing env: producer at ~1k msg/s, 90-day retention
    val est = Capacity.estimate(hl, totals, msgsPerSecond = 1000, retentionDays = 90)
    assert(est.rawRowsPerDay == 86400000L)
    assert(est.aggRowsPerDay > 0 && est.aggRowsPerDay <= est.rawRowsPerDay)
    assert(est.totalBytes == est.aggBytesPerDay * 90)
    assert(est.human.contains("GiB"))
  }
}
