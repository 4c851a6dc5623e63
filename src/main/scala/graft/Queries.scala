package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HttpLog

/** One registered query of the engine.
  *
  * @param name   stable id (SURVEY.md §2)
  * @param fn     Spark implementation, given (session, sf-dir)
  * @param oracle equivalent DuckDB SQL over the raw parquet tables (None for
  *               non-SQL-expressible operators → driver does a rows-only check)
  * @param bench  part of the headline benchmark set
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** The full query inventory (SURVEY.md §2). Spark impl and DuckDB oracle are
  * kept adjacent so their output column names stay in lockstep — the driver's
  * compare sorts columns by name before hashing.
  */
object Queries {

  private def httpLog(s: SparkSession, dir: String): DataFrame =
    HttpLog.view(Tables.events(s, dir))

  // ---------------------------------------------------------------- group A

  private val a01 = Q(
    "a01_capnp_roundtrip",
    (s, dir) => {
      // Encode every http_log row as a framed capnp message, then decode it
      // back — the oracle projects the same fields directly, so the compare
      // passes iff the codec round-trips the public wire format faithfully.
      val hl = HttpLog.view(Tables.events(s, dir))
        .withColumn("ts_milli", expr("unix_millis(ts)"))
      val enc = hl.select(
        graft.functions.capnp_encode_http_log(
          col("ts_milli"), col("resource_id"), col("bytes_sent"),
          col("request_time_milli"), col("response_status"),
          col("cache_status"), col("method"), col("remote_addr"), col("url")
        ).as("msg"))
      enc
        .select(graft.functions.capnp_decode_http_log(col("msg")).as("r"))
        .select(
          col("r.ts_milli").as("ts_milli"),
          col("r.resource_id").as("resource_id"),
          col("r.bytes_sent").as("bytes_sent"),
          col("r.request_time_milli").as("request_time_milli"),
          col("r.response_status").as("response_status"),
          col("r.cache_status").as("cache_status"),
          col("r.method").as("method"),
          col("r.remote_addr").as("remote_addr"),
          col("r.url").as("url"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT CAST(epoch_ms(ts) AS BIGINT) AS ts_milli, resource_id, bytes_sent,
      |       request_time_milli, response_status, cache_status, method,
      |       remote_addr, url
      |FROM http_log""".stripMargin))

  private val a02 = Q(
    "a02_anonymize_ip",
    (s, dir) => {
      // Reference anonymize_ip semantics over three shapes: the view's IPv4
      // addresses, synthesized canonical IPv6 addresses, and non-IP garbage
      // (must pass through unchanged, lib.rs:255).
      val hl = HttpLog.view(Tables.events(s, dir))
        .withColumn("v6", format_string("2001:db8:%x:1::%x",
          col("resource_id") + 1, (col("log_id") % 65535) + 1))
      hl.select(
        col("log_id"),
        graft.functions.anonymize_ip(col("remote_addr")).as("anon_v4"),
        graft.functions.anonymize_ip(col("v6")).as("anon_v6"),
        graft.functions.anonymize_ip(col("url")).as("anon_junk"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT log_id,
      |       regexp_replace(remote_addr, '\\.[0-9]+$$', '.x') AS anon_v4,
      |       printf('2001:db8:%x:1::%x', resource_id + 1, (log_id % 65535) + 1) || ':xxxx' AS anon_v6,
      |       url AS anon_junk
      |FROM http_log""".stripMargin))

  private val a03 = Q(
    "a03_dedup_replacing",
    (s, dir) => {
      // ReplacingMergeTree-FINAL semantics (reference DDL http_log.rs:105-107):
      // latest row per sort key. max_by(struct, log_id) keeps it one shuffle
      // with map-side partial aggregation — no per-partition sort like a
      // row_number window would need.
      val hl = httpLog(s, dir).withColumn("ts_sec", date_trunc("second", col("ts")))
      hl.groupBy("resource_id", "response_status", "remote_addr", "ts_sec")
        .agg(max_by(
          struct(col("log_id"), col("bytes_sent"), col("url")),
          col("log_id")).as("r"))
        .select(
          col("resource_id"), col("response_status"), col("remote_addr"), col("ts_sec"),
          col("r.log_id").as("log_id"),
          col("r.bytes_sent").as("bytes_sent"),
          col("r.url").as("url"))
    },
    Some(s"""WITH ${HttpLog.cteBody},
      |ranked AS (
      |  SELECT resource_id, response_status, remote_addr,
      |         date_trunc('second', ts) AS ts_sec, log_id, bytes_sent, url,
      |         row_number() OVER (
      |           PARTITION BY resource_id, response_status, remote_addr, date_trunc('second', ts)
      |           ORDER BY log_id DESC) AS rn
      |  FROM http_log)
      |SELECT resource_id, response_status, remote_addr, ts_sec, log_id, bytes_sent, url
      |FROM ranked WHERE rn = 1""".stripMargin),
    bench = true)

  private val a04 = Q(
    "a04_traffic_totals",
    (s, dir) => {
      // The reference README's "totals of served traffic for any combination
      // of resource ID, HTTP status, cache status and IP address" per hour.
      httpLog(s, dir)
        .groupBy(
          col("resource_id"), col("response_status"), col("cache_status"),
          col("remote_addr"), date_trunc("hour", col("ts")).as("ts_hour"))
        .agg(
          count(lit(1)).as("requests"),
          sum("bytes_sent").as("total_bytes"),
          sum("request_time_milli").as("total_time_milli"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT resource_id, response_status, cache_status, remote_addr,
      |       date_trunc('hour', ts) AS ts_hour,
      |       count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       CAST(sum(request_time_milli) AS BIGINT) AS total_time_milli
      |FROM http_log
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin),
    bench = true)

  private val a06 = Q(
    "a06_top_resources",
    (s, dir) =>
      httpLog(s, dir)
        .groupBy("resource_id")
        .agg(sum("bytes_sent").as("total_bytes"), count(lit(1)).as("requests"))
        .orderBy(col("total_bytes").desc, col("resource_id"))
        .limit(10),
    Some(s"""${HttpLog.cte}
      |SELECT resource_id,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       count(*) AS requests
      |FROM http_log
      |GROUP BY 1
      |ORDER BY total_bytes DESC, resource_id
      |LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------- group B

  private val b01 = Q(
    "b01_pricing_summary",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    bench = true)

  private val b02 = Q(
    "b02_revenue_by_nation",
    (s, dir) => {
      // Fact-to-fact joins shuffle on their keys; nation is tiny at every SF
      // and broadcast explicitly. customer/orders are left to AQE (broadcast
      // at small SF, shuffle-hash at 100 TB).
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("line_cnt"))
    },
    Some("""SELECT n_name AS nation,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS line_cnt
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin),
    bench = true)

  // ---------------------------------------------------------------- group E

  private val e01 = Q(
    "e01_token_stats",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("tok_cnt"),
        length(col("text")).as("char_cnt")),
    Some("""SELECT doc_id,
      |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS tok_cnt,
      |       CAST(length(text) AS INT) AS char_cnt
      |FROM documents""".stripMargin))

  // ----------------------------------------------------------------

  val all: Seq[Q] = Seq(a01, a02, a03, a04, a06, b01, b02, e01)
}
