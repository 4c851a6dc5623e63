package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (attribution): every click paired
  * with the purchases of the same user inside the attribution window.
  *
  * The SAME function is the batch and the streaming plan. In streaming, both
  * inputs carry watermarks and the join condition bounds event time on BOTH
  * sides (`buy_ts ∈ [click_ts, click_ts + w)`), which is exactly what lets
  * Structured Streaming expire state: a buffered click can be dropped once
  * the purchase-side watermark passes `click_ts + w`, and a buffered
  * purchase once the click-side watermark passes `buy_ts` — state is O(rows
  * inside the window), not O(stream history). Parity with the batch result
  * is proven in StreamingSpec.
  *
  * Inputs (caller renames): clicks (user_id, click_id, click_ts),
  * purchases (p_user, buy_id, buy_ts, amount).
  */
object IntervalJoin {

  def attribute(clicks: DataFrame, purchases: DataFrame,
                windowMinutes: Int = 240): DataFrame =
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") < col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("buy_id"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("click_ts")))
          .as("secs_to_buy"),
        col("amount"))
}
