package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The served-traffic totals table as a partitioned parquet layout, mirroring
  * the reference's ClickHouse DDL (`/root/reference/anonymizer/src/http_log.rs:105-107`):
  *
  * {{{
  * ENGINE = ReplacingMergeTree
  * PARTITION BY toYYYYMM(timestamp)
  * ORDER BY (resource_id, response_status, remote_addr, timestamp)
  * }}}
  *
  * → parquet partitioned by `ym` (yyyyMM) and sorted within partitions by the
  * same key. Time-range dashboard queries then prune whole months at the
  * file-listing level (`PartitionFilters` in the scan), which is what makes
  * "seconds at best" hold at 100 TB.
  */
object TotalsTable {

  /** Write hourly totals partitioned by month, sorted by the serving key. */
  def write(totals: DataFrame, path: String): Unit =
    totals
      .withColumn("ym", date_format(col("ts_hour"), "yyyyMM"))
      .repartition(col("ym"))
      .sortWithinPartitions("resource_id", "response_status", "remote_addr", "ts_hour")
      .write
      .mode("overwrite")
      .partitionBy("ym")
      .parquet(path)

  /** Month-pruned read: only the requested ym partitions are listed/scanned. */
  def readMonth(spark: SparkSession, path: String, ym: String): DataFrame =
    spark.read.parquet(path).filter(col("ym") === ym)
}
