package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maps the synthetic `events` table onto the reference's `http_log` domain
  * (schema from `/root/reference/http_log.capnp` and the ClickHouse DDL in
  * `/root/reference/anonymizer/src/http_log.rs:94-108`):
  *
  * {{{
  * timestamp, resource_id, bytes_sent, request_time_milli,
  * response_status, cache_status, method, remote_addr, url
  * }}}
  *
  * The derivation is deterministic from (event_id, user_id, event_type, value)
  * and is defined twice, in lockstep: [[view]] (Spark columns) and [[cte]]
  * (DuckDB SQL used as a WITH-prefix by every oracle query). Any edit here
  * MUST change both.
  */
object HttpLog {

  /** Spark-side http_log view over [[graft.Tables.events]]. */
  def view(events: DataFrame): DataFrame = events.select(
    col("event_id").as("log_id"),
    col("ts"),
    (col("user_id") % 50).as("resource_id"),
    floor(col("value") * 1000).as("bytes_sent"),
    floor(col("value") * 10).as("request_time_milli"),
    when(col("event_type") === "error",
      when(col("user_id") % 2 === 0, 500).otherwise(404))
      .when(col("event_type") === "purchase", 201)
      .when(col("event_type") === "signup", 301)
      .otherwise(200)
      .as("response_status"),
    when(col("user_id") % 3 === 0, "HIT")
      .when(col("user_id") % 3 === 1, "MISS")
      .otherwise("EXPIRED")
      .as("cache_status"),
    when(col("event_type").isin("purchase", "signup"), "POST")
      .otherwise("GET")
      .as("method"),
    format_string("10.%d.%d.%d",
      col("user_id") % 2,
      expr("(user_id div 16) % 16"),
      col("user_id") % 16
    ).as("remote_addr"),
    format_string("/r/%d/u/%d", col("user_id") % 50, col("user_id")).as("url")
  )

  /** DuckDB CTE equivalent of [[view]]; `ts` keeps DuckDB's ns precision, so
    * oracle queries must only emit `date_trunc`'d (≤ second) forms of it.
    * Compose additional CTEs as `s"WITH $cteBody, more AS (...) SELECT ..."`.
    */
  val cteBody: String =
    """http_log AS (
      |  SELECT
      |    event_id AS log_id,
      |    ts,
      |    user_id % 50 AS resource_id,
      |    CAST(floor(value * 1000) AS BIGINT) AS bytes_sent,
      |    CAST(floor(value * 10) AS BIGINT) AS request_time_milli,
      |    CASE WHEN event_type = 'error' THEN (CASE WHEN user_id % 2 = 0 THEN 500 ELSE 404 END)
      |         WHEN event_type = 'purchase' THEN 201
      |         WHEN event_type = 'signup' THEN 301
      |         ELSE 200 END AS response_status,
      |    CASE WHEN user_id % 3 = 0 THEN 'HIT'
      |         WHEN user_id % 3 = 1 THEN 'MISS'
      |         ELSE 'EXPIRED' END AS cache_status,
      |    CASE WHEN event_type IN ('purchase', 'signup') THEN 'POST' ELSE 'GET' END AS method,
      |    printf('10.%d.%d.%d', user_id % 2, (user_id // 16) % 16, user_id % 16) AS remote_addr,
      |    printf('/r/%d/u/%d', user_id % 50, user_id) AS url
      |  FROM events
      |)""".stripMargin

  val cte: String = s"WITH $cteBody\n"
}
