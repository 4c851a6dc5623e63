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

  // ---- provisioning estimators pinned to the r12 1000x probe records ----
  // (SURVEY §6 addenda). Pure arithmetic: if a future edit changes a
  // formula or a calibration constant, these are the rows that go red.

  test("index-build scratch matches the recorded g09 band-index bound") {
    // g09 1000x: 5M docs x 32 bands x ~812 B/doc banded payload filled the
    // box at ~130 GB of shuffle scratch (38 `No space left` failures).
    val g09 = Capacity.indexBuildScratch(5000000L, 812.0, 32.0)
    assert(g09.scratchBytes > 125L * 1000 * 1000 * 1000 &&
      g09.scratchBytes < 135L * 1000 * 1000 * 1000,
      s"g09 calibration drifted: ${g09.human}")
    assert(g09.human.contains("GiB"))
    // gram family (e22/c15): shuffle = instances x 16 B exactly.
    assert(Capacity.indexBuildScratch(1000000000L, 16.0).scratchBytes ==
      16L * 1000 * 1000 * 1000)
  }

  test("bucket plan reproduces the bucketed-join third-decade finding") {
    // rows form: the probe's restored regime was 256 buckets at 600M rows
    // (~2.3M rows/bucket); the 100x point's 32-bucket layout was right AT
    // 100x (60M rows) and wrong at 1000x.
    assert(Capacity.bucketsForRows(600000000L) == 256)
    assert(Capacity.bucketsForRows(60000000L) == 32)
    // bytes form: ~19.2 GB of slim join rows (600M x ~32 B) wants 64+
    // buckets under the 500 MB ceiling; the stale 32-bucket layout falls
    // BELOW the window's minimum (buckets too big — the recorded collapse).
    val plan = Capacity.bucketPlan(19200000000L)
    assert(plan.recommended == 64 && plan.minBuckets == 37)
    assert(32 < plan.minBuckets, "the r12 failure layout must be out-of-window")
    assert(plan.bytesPerBucket >= (100L << 20) && plan.bytesPerBucket <= (500L << 20))
    // degenerate input: tiny tables provision a single bucket.
    assert(Capacity.bucketPlan(10L << 20).recommended == 1)
  }

  test("bucket plan stays inside a caller-narrowed window (r14 ADVICE)") {
    // A < 2x window can exclude every power of two: 19.2 GB in [400, 500] MB
    // buckets wants [37, 45]; pow2 64 overshoots -> cap at maxBuckets.
    val narrow = Capacity.bucketPlan(19200000000L, 400L << 20, 500L << 20)
    assert(narrow.recommended == narrow.maxBuckets && narrow.maxBuckets == 45)
    assert(narrow.bytesPerBucket >= (400L << 20) && narrow.bytesPerBucket <= (500L << 20),
      s"recommended must honor its own window: ${narrow.human}")
    // the degenerate min==max window the ADVICE named
    val pinned = Capacity.bucketPlan(19200000000L, 500L << 20, 500L << 20)
    assert(pinned.recommended >= pinned.minBuckets && pinned.recommended <= pinned.maxBuckets)
    assert(pinned.bytesPerBucket <= (500L << 20))
  }

  test("bucket plan refuses tables past the 2^30 bucket ceiling (r14 ADVICE)") {
    // ~1 EB at the 500 MB default ceiling needs ~2.2e9 buckets: previously
    // minBuckets wrapped negative while recommended saturated below it.
    val e = intercept[IllegalArgumentException](Capacity.bucketPlan(1L << 60))
    assert(e.getMessage.contains("shard the table"))
    // the largest in-range input still yields a coherent plan
    val max = Capacity.bucketPlan((1L << 30) * (500L << 20))
    assert(max.minBuckets == (1 << 30) && max.recommended == (1 << 30))
  }

  test("graph memory knob matches the recorded b43 RSS point") {
    // b43 1000x: 600M edges sat at ~54 GB RSS on the 48g single box.
    assert(Capacity.graphResidentBytes(600000000L) == 54000000000L)
    // fleet form: the same corpus on 8 GiB-budget executors needs 7.
    assert(Capacity.graphExecutors(600000000L, 8L << 30) == 7)
    assert(Capacity.graphExecutors(0L, 8L << 30) == 1)
  }
}
