package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capacity planning for the totals store — the reference README's sizing
  * task ("Provide an estimate of disk space required given (1) average
  * incoming message rate, (2) retention of the aggregated data",
  * `/root/reference/README.md:63-66`). Works from measured data: bytes per
  * aggregated row and the observed cardinality compression of the rollup.
  */
object Capacity {

  final case class Estimate(rawRowsPerDay: Long, aggRowsPerDay: Long,
                            aggBytesPerDay: Long, retentionDays: Int,
                            totalBytes: Long) {
    def human: String =
      f"$rawRowsPerDay%d raw rows/day → $aggRowsPerDay%d agg rows/day " +
        f"(${aggBytesPerDay / 1048576.0}%.1f MiB/day) × $retentionDays%d days " +
        f"= ${totalBytes / 1073741824.0}%.2f GiB"
  }

  /** Measure the aggregation ratio and per-row footprint from a sample of
    * raw logs + its totals, then extrapolate to a target message rate and
    * retention. `avgAggRowBytes` defaults to a measured parquet figure for
    * the totals schema (~64 B/row compressed).
    */
  def estimate(rawSample: DataFrame, totalsSample: DataFrame,
               msgsPerSecond: Double, retentionDays: Int,
               avgAggRowBytes: Int = 64): Estimate = {
    val rawN = rawSample.count().toDouble
    val aggN = totalsSample.count().toDouble
    val compression = if (rawN == 0) 1.0 else aggN / rawN
    val rawPerDay = (msgsPerSecond * 86400).toLong
    val aggPerDay = (rawPerDay * compression).toLong
    val bytesPerDay = aggPerDay * avgAggRowBytes
    Estimate(rawPerDay, aggPerDay, bytesPerDay, retentionDays,
      bytesPerDay * retentionDays)
  }

  // --------------------------------------------------------------------
  // Closed-form provisioning estimators for the two resource bounds the
  // r12 1000x probes recorded (SURVEY §6 serving/graph addenda + the
  // bucketed-join third decade). Each is exact arithmetic over the same
  // quantities the probes named; CapacitySpec pins them to the recorded
  // figures so the rule and the measurement can never drift apart.
  // --------------------------------------------------------------------

  /** Cluster shuffle-scratch sizing for signature-replicating builds —
    * any plan that explodes a per-item payload `replication` times before
    * the shuffle (banded LSH index builds, gram-instance shuffles).
    * Recorded calibration points (SURVEY §6 addenda, r12 1000x probes):
    * the g09 band-index build (`NearDupScreen.writeIndex`, 5M docs x 32
    * bands, ~812 B/doc banded shingle payload) needs ~130 GB of shuffle
    * scratch — it filled this box's disk (38 `No space left` failures);
    * the e22/c15 gram family ships ~16 B/instance (8-byte xxhash64 key +
    * row overhead), so its scratch is gram instances x 16 B. Provision
    * cluster shuffle space (or `spark.local.dir` aggregate) to
    * `scratchBytes` BEFORE launching an index build — the cost is linear
    * by construction, so one measured decade calibrates the payload.
    */
  final case class ScratchEstimate(items: Long, avgPayloadBytes: Double,
                                   replication: Double, scratchBytes: Long) {
    def human: String =
      f"$items%d items x $avgPayloadBytes%.0f B x $replication%.0f replicas " +
        f"= ${scratchBytes / 1073741824.0}%.1f GiB shuffle scratch"
  }

  def indexBuildScratch(items: Long, avgPayloadBytes: Double,
                        replication: Double = 1.0): ScratchEstimate =
    ScratchEstimate(items, avgPayloadBytes, replication,
      (items * avgPayloadBytes * replication).toLong)

  /** Bucket-count provisioning for bucketed co-located joins (b50 /
    * `Bucketing.writeBucketed`). Bucketed files never split: one task
    * scans+joins each bucket whole, so bytes-per-bucket must be sized to
    * the TARGET volume, not inherited from a small-scale layout. The r12
    * bucketed third decade recorded the failure and the rule: at 600M
    * rows the 10x/100x layout's 32 buckets left ~19M-row single-task
    * files and the 4.4x win collapsed to 1.4x; re-provisioning to 256
    * buckets (~2.3M rows/bucket) restored 2.2x. Rule: ~100-500 MB per
    * bucket — the same window as shuffle-partition sizing.
    *
    * `recommended` is the smallest power of two keeping buckets under
    * `maxBucketBytes` (powers of two keep future re-provisioning
    * bucket-union-friendly); `minBuckets`/`maxBuckets` bound the window.
    * A caller-narrowed window (< 2x between min and max bucket bytes) can
    * exclude every power of two — then `recommended` caps at `maxBuckets`
    * so the plan always stays inside its own window (r14 ADVICE). Tables
    * whose floor bucket count exceeds 2^30 are refused loudly rather than
    * returning a wrapped/saturated self-inconsistent plan: at that size a
    * single bucketed table is the wrong layout — shard first.
    */
  final case class BucketPlan(totalBytes: Long, minBuckets: Int,
                              maxBuckets: Int, recommended: Int) {
    def bytesPerBucket: Long = totalBytes / recommended
    def human: String =
      f"${totalBytes / 1073741824.0}%.1f GiB -> $recommended%d buckets " +
        f"(${bytesPerBucket / 1048576.0}%.0f MiB each; window [$minBuckets, $maxBuckets])"
  }

  def bucketPlan(totalBytes: Long, minBucketBytes: Long = 100L << 20,
                 maxBucketBytes: Long = 500L << 20): BucketPlan = {
    require(totalBytes >= 0 && 0 < minBucketBytes && minBucketBytes <= maxBucketBytes,
      s"bad bucket window: total=$totalBytes window=[$minBucketBytes, $maxBucketBytes]")
    val lo = math.max(1L, (totalBytes + maxBucketBytes - 1) / maxBucketBytes)
    require(lo <= (1L << 30),
      s"totalBytes=$totalBytes needs $lo buckets of <=$maxBucketBytes B each — " +
        "beyond the 2^30 single-table ceiling; shard the table before bucket-planning")
    val hi = math.max(lo, totalBytes / minBucketBytes).min(Int.MaxValue.toLong).toInt
    var rec = 1
    while (rec < lo) rec <<= 1 // terminates: lo <= 2^30 by the require above
    BucketPlan(totalBytes, lo.toInt, hi, rec.min(hi))
  }

  /** Row-count form of the same rule, anchored at the probe's restored
    * regime (~2.3M slim rows/bucket at the 1000x point): the power of two
    * nearest in log2 to rows/targetRowsPerBucket. 600M rows -> 256.
    */
  def bucketsForRows(rows: Long, targetRowsPerBucket: Long = 2300000L): Int = {
    require(rows >= 0 && targetRowsPerBucket > 0,
      s"bad row sizing: rows=$rows target=$targetRowsPerBucket")
    val ratio = math.max(1.0, rows.toDouble / targetRowsPerBucket)
    1 << math.round(math.log(ratio) / math.log(2.0)).toInt.min(30)
  }

  /** Per-executor memory sizing for the iterative graph family (b43
    * PageRank). The r12 graph third decade recorded ~54 GB RSS at 600M
    * edges on the single 48g-heap box (~90 resident bytes/edge: the
    * persisted edge partitions + rank/degree vectors + JVM overhead) —
    * linear in edges, so the knob on a real cluster is edges-per-executor
    * such that `edges/executors x bytesPerEdge` fits the executor budget.
    */
  def graphResidentBytes(edges: Long, bytesPerEdge: Double = 90.0): Long =
    (edges * bytesPerEdge).toLong

  def graphExecutors(edges: Long, perExecutorBudgetBytes: Long,
                     bytesPerEdge: Double = 90.0): Int = {
    require(edges >= 0 && perExecutorBudgetBytes > 0 && bytesPerEdge > 0,
      s"bad graph sizing: edges=$edges budget=$perExecutorBudgetBytes b/edge=$bytesPerEdge")
    val need = edges * bytesPerEdge
    math.max(1L, math.ceil(need / perExecutorBudgetBytes).toLong)
      .min(Int.MaxValue).toInt
  }
}
