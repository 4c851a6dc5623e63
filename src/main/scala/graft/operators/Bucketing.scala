package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support for shuffle-free co-located joins (SURVEY.md §4).
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
  * sides. Writing both tables bucketed (and sorted) by the join key lets
  * Spark plan a SortMergeJoin with NO Exchange on either side — the buckets
  * are the partitions. This is the batch analog of the reference's
  * pre-partitioned ClickHouse sort key (`http_log.rs:105-107`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket columns (shuffle-free
    * when `spark.sql.sources.bucketing.enabled` is on, the default).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    on: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), on)
}
