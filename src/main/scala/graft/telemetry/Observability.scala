package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline metrics via Spark's `observe` API — the engine-native equivalent
  * of the reference's Prometheus counters
  * (`/root/reference/anonymizer/src/telemetry.rs`: processed/failed message
  * counts, insert sizes). Observed metrics ride the query itself: on streams
  * they appear in every `StreamingQueryProgress.observedMetrics`, on batch
  * queries in `QueryExecution.observedMetrics` — no side channel, no
  * accumulator plumbing, zero extra passes over the data.
  */
object Observability {

  val MetricsName = "graft_metrics"

  /** Count rows/bytes flowing through a log DataFrame at this point. */
  def observedLogs(df: DataFrame): DataFrame =
    df.observe(MetricsName,
      count(lit(1)).as("rows"),
      sum("bytes_sent").as("bytes"),
      sum(when(col("response_status") >= 500, 1L).otherwise(0L)).as("server_errors"))
}
