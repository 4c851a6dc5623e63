package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Dedup, HttpLog, Multimodal, Overlap, SemDedup, Similarity, Skew, TextLm}

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

  // Scan fan-out (a gated repartition-to-defaultParallelism after the
  // scan) was INVESTIGATED this round and rejected everywhere
  // (OPTIMIZATION_r21.md §2): the testdata tables are single-file,
  // single-row-group parquet, so every scan is at most one task and the
  // whole map side serializes on 1-2 cores — but interleaved A/B measured
  // the recovery exchange costing MORE than the serialized work it frees
  // on every query (2-3× worse on cheap map sides; even a00's heavy capnp
  // stack read 1.04-1.07× worse on bench mins, its 32-way stage burning
  // ~4× the single-task CPU on memory-bandwidth contention). At production
  // scale inputs arrive with ≥ cores splits and the question disappears.

  private def httpLog(s: SparkSession, dir: String): DataFrame =
    HttpLog.view(Tables.events(s, dir))

  /** http_log view + epoch-millis column, as the capnp encoder wants it. */
  private def httpLogMs(s: SparkSession, dir: String): DataFrame =
    httpLog(s, dir).withColumn("ts_milli", expr("unix_millis(ts)"))

  /** The 9-field HttpLogRecord encode over [[httpLogMs]] columns. */
  private def capnpMsg: org.apache.spark.sql.Column =
    graft.functions.capnp_encode_http_log(
      col("ts_milli"), col("resource_id"), col("bytes_sent"),
      col("request_time_milli"), col("response_status"),
      col("cache_status"), col("method"), col("remote_addr"), col("url"))

  /** embeddings + planted exact twins at vec_id+100000 (every 25th vector). */
  private def augEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))
  }

  /** DuckDB equivalent of anonymize_ip over the view's IPv4 addresses. */
  private val anonV4Sql = """regexp_replace(remote_addr, '\.[0-9]+$', '.x')"""

  /** Generated SQL replay of d08's PQ pipeline (m=8, w=8, kc=64, one Lloyd
    * round, shortlist 5·32, k=5). Explicit per-term sums pin the double
    * accumulation ORDER to Spark's sequential aggregate fold; the
    * CAST-to-REAL on each square reproduces Spark's float-precision
    * multiply bit-for-bit (a 24-bit product fits double exactly, so
    * double-multiply-then-round-to-float ≡ float multiply).
    */
  private lazy val pqOracleSql: String = {
    // Σ float(e[i]²) widened to double, i = 1..64 — Spark's dot(v, v)
    val normSq = (1 to 64)
      .map(i => s"CAST(CAST(e[$i] * e[$i] AS REAL) AS DOUBLE)").mkString(" + ")
    // Σ (a[aOff+j] − b[bOff+j])² over the 8-dim subspace, sequential order;
    // bOff = "" for the trained codebook (8-dim lists), the subspace offset
    // for seed centroids (full 64-dim vectors — indexing them at [j] was the
    // bug that scrambled the initial assignment)
    def l2sq8(a: String, aOff: String, bv: String, bOff: String) = (1 to 8)
      .map { j =>
        val bi = if (bOff.isEmpty) s"$j" else s"$bOff + $j"
        s"($a[$aOff + $j] - $bv[$bi]) * ($a[$aOff + $j] - $bv[$bi])"
      }
      .mkString(" + ")
    val dot8 = (1 to 8).map(j => s"q.nv[b.sub * 8 + $j] * b.cv[$j]").mkString(" + ")
    val adcSum = (0 until 8)
      .map(s => s"max(CASE WHEN l.sub = $s THEN l.v END)").mkString(" + ")
    s"""WITH aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
      |  FROM embeddings WHERE vec_id % 25 = 0),
      |nrm AS (
      |  SELECT vec_id, e, list_transform(e, x -> x / sqrt($normSq)) AS nv
      |  FROM aug),
      |a0 AS (
      |  SELECT v.vec_id, s.i AS sub, c.vec_id AS scid,
      |    row_number() OVER (PARTITION BY v.vec_id, s.i
      |      ORDER BY ${l2sq8("v.nv", "s.i * 8", "c_sv", "s.i * 8")} ASC, c.vec_id ASC) AS rn
      |  FROM nrm v, generate_series(0, 7) s(i),
      |    (SELECT vec_id, nv AS c_sv FROM nrm WHERE vec_id < 64) c),
      |code0 AS (SELECT vec_id, sub, scid AS cid FROM a0 WHERE rn = 1),
      |cb1 AS (
      |  SELECT c0.sub, c0.cid, s2.j,
      |    CAST(CAST(avg(round(v.nv[c0.sub * 8 + s2.j] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS cvj
      |  FROM code0 c0 JOIN nrm v USING (vec_id), generate_series(1, 8) s2(j)
      |  GROUP BY c0.sub, c0.cid, s2.j),
      |cbl AS (SELECT sub, cid, list(cvj ORDER BY j) AS cv FROM cb1 GROUP BY sub, cid),
      |enc AS (
      |  SELECT v.vec_id, b.sub, b.cid,
      |    row_number() OVER (PARTITION BY v.vec_id, b.sub
      |      ORDER BY ${l2sq8("v.nv", "b.sub * 8", "b.cv", "")} ASC, b.cid ASC) AS rn
      |  FROM nrm v CROSS JOIN cbl b),
      |codes AS (SELECT vec_id, sub, cid FROM enc WHERE rn = 1),
      |lut AS (
      |  SELECT q.vec_id AS qid, b.sub, b.cid, $dot8 AS v
      |  FROM nrm q CROSS JOIN cbl b WHERE q.vec_id >= 100000),
      |adc AS (
      |  SELECT l.qid, c.vec_id, $adcSum AS adc
      |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.cid
      |  GROUP BY l.qid, c.vec_id),
      |short AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS rn
      |    FROM adc) WHERE rn <= 160),
      |ranked AS (
      |  SELECT s.qid, s.vec_id AS neighbor,
      |    list_cosine_similarity(a.e, qa.e) AS cs,
      |    row_number() OVER (PARTITION BY s.qid
      |      ORDER BY list_cosine_similarity(a.e, qa.e) DESC, s.vec_id) AS rank
      |  FROM short s
      |  JOIN aug a ON a.vec_id = s.vec_id
      |  JOIN aug qa ON qa.vec_id = s.qid
      |  WHERE s.vec_id <> s.qid)
      |SELECT qid, neighbor, round(cs, 4) AS cos_sim, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 5""".stripMargin
  }

  // ---------------------------------------------------------------- group A

  private val a00 = Q(
    "a00_pipeline_e2e",
    (s, dir) => {
      // The reference's whole job as one plan: serialize each log to a capnp
      // frame (standing in for the Kafka payload), decode with dead-letter
      // split, anonymize, replay-dedup, aggregate hourly totals. The oracle
      // computes the same totals directly — it matches iff codec,
      // anonymization, dedup and aggregation all compose correctly.
      val payloads = httpLogMs(s, dir).select(capnpMsg.as("value"), col("log_id"))
      // at-least-once: 20% of frames delivered twice. The replica fan-out is
      // an explode over the ALREADY-ENCODED bytes — one scan, one capnp
      // encode per source row (the previous self-union planned a second
      // full scan AND re-encoded the whole table to yield the 20%)
      val replayed = payloads.select(col("value"), col("log_id"),
          explode(when(col("log_id") % 5 === 0, array(lit(0), lit(1)))
            .otherwise(array(lit(0)))).as("rep"))
        .drop("rep")
      val frames = sources.KafkaShaped.framesFromPayloads(replayed, "value", "log_id")
      val (good, _) = sources.KafkaShaped.decodeSplit(frames)
      val logs = streaming.HttpLogPipeline.anonymize(
        good.select(expr("timestamp_millis(r.ts_milli)").as("ts"),
          col("r.resource_id").as("resource_id"),
          col("r.bytes_sent").as("bytes_sent"),
          col("r.request_time_milli").as("request_time_milli"),
          col("r.response_status").as("response_status"),
          col("r.cache_status").as("cache_status"),
          col("r.remote_addr").as("remote_addr"),
          col("r.url").as("url"),
          col("offset").as("log_id")))
      // replayed frames are byte-identical ⇒ dedup over ALL columns, which
      // plans as a bufferless codegen HashAggregate instead of the
      // SortAggregate + First-object buffers a keyed dropDuplicates needs.
      // r22: ONE exchange instead of two — repartition by the four stable
      // key columns shared by BOTH aggregations. hash(resource_id, status,
      // cache_status, remote_addr) clusters every dedup group (subset of
      // the 9 dedup keys) AND every hourly group (subset of its 5 keys), so
      // the replay dedup and the hourly rollup run back-to-back in a single
      // post-shuffle stage with no second exchange of the deduped rows.
      // Trade-off (scale): the explicit repartition sits below the partial
      // aggregation, so byte-identical replicas no longer collapse map-side
      // — the single exchange carries all replayed rows (~1.2×N) where the
      // old first exchange carried ~N after partial dedup; in return the
      // old SECOND exchange (hourly partials, ~group-count rows of 7 cols)
      // disappears. On http-log shapes the hourly group count is the same
      // order as N (9874 groups / 10k logs here), so total exchanged bytes
      // DROP as well; a deployment with massive per-group collapse can
      // restore the two-exchange shape (-Dgraft.a00onex=off, AbProbe hook).
      val deduped = if (sys.props.get("graft.a00onex").contains("off")) logs
        else logs.repartition(col("resource_id"), col("response_status"),
          col("cache_status"), col("remote_addr"))
      val once = streaming.HttpLogPipeline.dedupReplayed(deduped, logs.columns.toSeq)
      // in-query telemetry (reference telemetry.rs counters): rows/bytes/5xx
      // ride the plan as observed metrics — no extra pass, asserted in
      // ObservabilitySpec against the same counts the oracle checks
      telemetry.Observability.observedLogs(once)
        .groupBy(date_trunc("hour", col("ts")).as("ts_hour"),
          col("resource_id"), col("response_status"), col("cache_status"),
          col("remote_addr"))
        .agg(count(lit(1)).as("requests"),
          sum("bytes_sent").as("total_bytes"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT date_trunc('hour', ts) AS ts_hour,
      |       resource_id, response_status, cache_status,
      |       $anonV4Sql AS remote_addr,
      |       count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
      |FROM http_log
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin),
    bench = true)

  private val a01 = Q(
    "a01_capnp_roundtrip",
    (s, dir) => {
      // Encode every http_log row as a framed capnp message, then decode it
      // back — the oracle projects the same fields directly, so the compare
      // passes iff the codec round-trips the public wire format faithfully.
      httpLogMs(s, dir)
        .select(capnpMsg.as("msg"))
        // fenced: the 9-field expansion below would otherwise let project
        // collapse re-derive the decode once per extracted field
        .select(graft.functions.opt_fence(
          graft.functions.capnp_decode_http_log(col("msg"))).as("r"))
        .select("r.*") // struct fields already carry the output names
    },
    Some(s"""${HttpLog.cte}
      |SELECT CAST(epoch_ms(ts) AS BIGINT) AS ts_milli, resource_id, bytes_sent,
      |       request_time_milli, response_status, cache_status, method,
      |       remote_addr, url
      |FROM http_log""".stripMargin),
    bench = true)

  private val a02 = Q(
    "a02_anonymize_ip",
    (s, dir) => {
      // Reference anonymize_ip semantics over three shapes: the view's IPv4
      // addresses, synthesized canonical IPv6 addresses, and non-IP garbage
      // (must pass through unchanged, lib.rs:255).
      val hl = httpLog(s, dir)
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
      |       $anonV4Sql AS anon_v4,
      |       printf('2001:db8:%x:1::%x', resource_id + 1, (log_id % 65535) + 1) || ':xxxx' AS anon_v6,
      |       url AS anon_junk
      |FROM http_log""".stripMargin))

  private val a03 = Q(
    "a03_dedup_replacing",
    (s, dir) => {
      // ReplacingMergeTree-FINAL semantics (reference DDL http_log.rs:105-107):
      // latest row per sort key, via the native keep_latest
      // TypedImperativeAggregate. The declarative forms (max_by, max(struct))
      // carry variable-width agg buffers → SortAggregate on both map and
      // reduce side (the 100× probe measured a03 at 2.4× a04 from those
      // sorts); keep_latest plans as ObjectHashAggregate — one shuffle,
      // map-side combine, no sorts.
      val hl = httpLog(s, dir).withColumn("ts_sec", date_trunc("second", col("ts")))
      hl.groupBy("resource_id", "response_status", "remote_addr", "ts_sec")
        .agg(graft.functions.keep_latest(col("log_id"),
          struct(col("log_id"), col("bytes_sent"), col("url"))).as("r"))
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

  private val a05 = Q(
    "a05_traffic_rollup",
    (s, dir) =>
      // Grafana-style pre-aggregate at multiple granularities in one pass
      // (per (resource, cache), per resource, grand total).
      httpLog(s, dir)
        .rollup("resource_id", "cache_status")
        .agg(
          count(lit(1)).as("requests"),
          sum("bytes_sent").as("total_bytes"),
          round(avg("request_time_milli"), 4).as("avg_time_milli")),
    Some(s"""${HttpLog.cte}
      |SELECT resource_id, cache_status,
      |       count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       round(avg(request_time_milli), 4) AS avg_time_milli
      |FROM http_log
      |GROUP BY ROLLUP (resource_id, cache_status)""".stripMargin))

  private val a07 = Q(
    "a07_error_rate",
    (s, dir) => {
      val hl = httpLog(s, dir)
      hl.groupBy(col("resource_id"), date_trunc("hour", col("ts")).as("ts_hour"))
        .agg(
          sum(when(col("response_status") >= 400, 1L).otherwise(0L)).as("errors"),
          count(lit(1)).as("requests"))
        .withColumn("error_rate",
          round(col("errors").cast("double") / col("requests"), 4))
    },
    Some(s"""${HttpLog.cte}
      |SELECT resource_id, date_trunc('hour', ts) AS ts_hour,
      |       CAST(sum(CASE WHEN response_status >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS errors,
      |       count(*) AS requests,
      |       round(CAST(sum(CASE WHEN response_status >= 400 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS error_rate
      |FROM http_log
      |GROUP BY 1, 2""".stripMargin))

  private val a08 = Q(
    "a08_latency_quantiles",
    (s, dir) =>
      // Exact interpolated percentiles (matches quantile_cont); at 100 TB the
      // approx_percentile sketch is the drop-in replacement, kept exact here
      // so the oracle can check it.
      httpLog(s, dir)
        .groupBy("resource_id")
        .agg(
          round(expr("percentile(request_time_milli, 0.5)"), 4).as("p50"),
          round(expr("percentile(request_time_milli, 0.95)"), 4).as("p95"),
          round(expr("percentile(request_time_milli, 0.99)"), 4).as("p99"),
          count(lit(1)).as("requests")),
    Some(s"""${HttpLog.cte}
      |SELECT resource_id,
      |       round(quantile_cont(request_time_milli, 0.5), 4) AS p50,
      |       round(quantile_cont(request_time_milli, 0.95), 4) AS p95,
      |       round(quantile_cont(request_time_milli, 0.99), 4) AS p99,
      |       count(*) AS requests
      |FROM http_log
      |GROUP BY 1""".stripMargin))

  private val a09 = Q(
    "a09_sessionize",
    (s, dir) => {
      // Gap-based sessionization (30 min): the one operator here that
      // genuinely needs a per-key ordered window — one shuffle + per-user
      // sort, the canonical distributed plan for it.
      val ev = Tables.events(s, dir)
      val byUser = Window.partitionBy("user_id").orderBy("ts_ns")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ordered = Window.partitionBy("user_id").orderBy("ts_ns")
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      ev.withColumn("new_sess",
          when(col("ts_ns") - lag("ts_ns", 1).over(ordered) > gapNs, 1L)
            .when(lag("ts_ns", 1).over(ordered).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(byUser))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          ((max("ts_ns") - min("ts_ns")) / lit(1000000000L)).cast("long").as("dur_sec"))
    },
    Some("""WITH marked AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns,
      |         CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL THEN 1
      |              WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000 THEN 1
      |              ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts))),
      |sess AS (
      |  SELECT user_id, ts_ns,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       CAST((max(ts_ns) - min(ts_ns)) // 1000000000 AS BIGINT) AS dur_sec
      |FROM sess GROUP BY 1, 2""".stripMargin),
    bench = true)

  private val a18 = Q(
    "a18_session_window",
    // a09's semantics through Spark's BUILT-IN session_window operator
    // (MergingSessionsExec machinery — sessions merge during aggregation,
    // no lag/cumsum window pass). Boundary nuance mirrored in the oracle:
    // session end = last event + gap, and an event at exactly the end
    // starts a NEW session (a09's manual rule keeps strictly-greater gaps
    // together). Emitted as unix micros — events.ts is µs-aligned
    // (verified: no sub-µs bits), so both engines see identical integers.
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
        .select(col("user_id"),
          expr("unix_micros(sw.start)").as("sess_start_us"),
          expr("unix_micros(sw.end)").as("sess_end_us"),
          col("n_events"), col("total_value")),
    Some("""WITH marked AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
      |              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1
      |              ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |sess AS (
      |  SELECT user_id, ts_us, value,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM marked)
      |SELECT user_id,
      |       min(ts_us) AS sess_start_us,
      |       max(ts_us) + 1800000000 AS sess_end_us,
      |       count(*) AS n_events,
      |       round(sum(value), 4) AS total_value
      |FROM sess GROUP BY user_id, sid""".stripMargin))

  private val a10 = Q(
    "a10_dead_letter",
    (s, dir) => {
      // Invalid-message routing through the real decode path: corrupt every
      // 97th frame (truncate to 8 bytes) and count what dead-letters. The
      // reference drops unparsable messages idempotently (lib.rs:112).
      httpLogMs(s, dir)
        .withColumn("msg", capnpMsg)
        .withColumn("msg", when(col("log_id") % 97 === 0,
          expr("substring(msg, 1, 8)")).otherwise(col("msg")))
        .withColumn("decoded", graft.functions.capnp_decode_http_log(col("msg")))
        .select(when(col("decoded").isNull, "dead_letter").otherwise("ok").as("reason"))
        .groupBy("reason")
        .agg(count(lit(1)).as("messages"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT CASE WHEN log_id % 97 = 0 THEN 'dead_letter' ELSE 'ok' END AS reason,
      |       count(*) AS messages
      |FROM http_log
      |GROUP BY 1""".stripMargin))

  private val a11 = Q(
    "a11_props_extract",
    (s, dir) =>
      // semi-structured payload extraction (events.props is a JSON string);
      // regexp keeps the oracle engine-agnostic, Spark's get_json_object /
      // from_json are drop-in for richer payloads
      Tables.events(s, dir)
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("events"), round(avg("value"), 4).as("avg_value")),
    Some("""SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_bucket,
      |       count(*) AS events, round(avg(value), 4) AS avg_value
      |FROM events GROUP BY 1""".stripMargin))

  private val a12 = Q(
    "a12_salted_totals",
    (s, dir) =>
      // same totals as a06's aggregate but via the two-phase salted plan —
      // the hot-key-safe variant; results must be identical to a direct agg
      Skew.saltedSumCount(httpLog(s, dir), Seq("resource_id"), Seq("bytes_sent"))
        .select(col("resource_id"), col("bytes_sent_sum").as("total_bytes"),
          col("row_cnt").as("requests")),
    Some(s"""${HttpLog.cte}
      |SELECT resource_id, CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       count(*) AS requests
      |FROM http_log GROUP BY 1""".stripMargin))

  private val a13 = Q(
    "a13_asof_enrich",
    (s, dir) => {
      // as-of self-enrichment: each event carries the user's most recent
      // prior purchase value (operators.AsOf; see Scaladoc for why this is
      // composed rather than a custom SparkPlan)
      val ev = Tables.events(s, dir)
      operators.AsOf.priorValue(ev, Seq("user_id"), "ts_ns",
          col("event_type") === "purchase", "value", "prior_purchase")
        .select(col("event_id"), col("user_id"),
          round(col("prior_purchase"), 2).as("prior_purchase"))
    },
    Some("""SELECT event_id, user_id,
      |       round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |             OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2) AS prior_purchase
      |FROM events""".stripMargin))

  private val a14 = Q(
    "a14_url_stats",
    (s, dir) => {
      // URL decomposition + per-host rollup, the access-log companion to the
      // totals family: rebuild a full URL from the view's path, parse it with
      // Spark's native parse_url (host / path / query-param extraction all
      // codegen-friendly string ops), aggregate per (host, cache param).
      val hl = httpLog(s, dir).withColumn("full_url",
        format_string("https://h%d.example.com%s?cache=%s&u=%d",
          col("resource_id") % 5, col("url"), col("cache_status"), col("log_id") % 97))
      hl.select(
          expr("parse_url(full_url, 'HOST')").as("host"),
          expr("parse_url(full_url, 'PATH')").as("path"),
          expr("parse_url(full_url, 'QUERY', 'cache')").as("cache"),
          col("bytes_sent"))
        .groupBy("host", "cache")
        .agg(
          count(lit(1)).as("requests"),
          countDistinct(col("path")).as("uniq_paths"),
          sum("bytes_sent").as("total_bytes"))
    },
    Some(s"""WITH ${HttpLog.cteBody},
      |urls AS (
      |  SELECT printf('https://h%d.example.com%s?cache=%s&u=%d',
      |                resource_id % 5, url, cache_status, log_id % 97) AS full_url,
      |         bytes_sent
      |  FROM http_log)
      |SELECT regexp_extract(full_url, '^https://([^/]+)', 1) AS host,
      |       regexp_extract(full_url, '[?&]cache=([A-Z]+)', 1) AS cache,
      |       count(*) AS requests,
      |       count(DISTINCT regexp_extract(full_url, '^https://[^/]+([^?]*)', 1)) AS uniq_paths,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
      |FROM urls
      |GROUP BY 1, 2""".stripMargin))

  private val a15 = Q(
    "a15_latency_hist_quantiles",
    (s, dir) => {
      // a08's 100 TB path: exact `percentile` buffers and sorts EVERY value
      // per group; latencies are integer milliseconds, so a histogram is
      // lossless — one hash-agg over (resource, ms), then the inverse CDF
      // walks the (tiny) histogram, not the raw rows. State per group is
      // bounded by the distinct-latency count regardless of row count.
      // Discrete ("lower") quantile: smallest value with cum ≥ ceil(q·n).
      val hist = httpLog(s, dir)
        .groupBy("resource_id", "request_time_milli")
        .agg(count(lit(1)).as("cnt"))
      val byRt = Window.partitionBy("resource_id").orderBy("request_time_milli")
      val all = Window.partitionBy("resource_id")
      def pick(q: Double) = min(when(
        col("cum") >= ceil(lit(q) * col("n")), col("request_time_milli")))
      hist
        .withColumn("cum", sum("cnt").over(byRt))
        .withColumn("n", sum("cnt").over(all))
        .groupBy("resource_id")
        .agg(pick(0.5).as("p50_ms"), pick(0.95).as("p95_ms"),
          pick(0.99).as("p99_ms"), max("n").as("requests"))
    },
    Some(s"""${HttpLog.cte}
      |, hist AS (
      |  SELECT resource_id, request_time_milli AS rt, count(*) AS cnt
      |  FROM http_log GROUP BY 1, 2),
      |cum AS (
      |  SELECT resource_id, rt,
      |         sum(cnt) OVER (PARTITION BY resource_id ORDER BY rt) AS cum,
      |         sum(cnt) OVER (PARTITION BY resource_id) AS n
      |  FROM hist)
      |SELECT resource_id,
      |       min(CASE WHEN cum >= ceil(0.5 * n) THEN rt END) AS p50_ms,
      |       min(CASE WHEN cum >= ceil(0.95 * n) THEN rt END) AS p95_ms,
      |       min(CASE WHEN cum >= ceil(0.99 * n) THEN rt END) AS p99_ms,
      |       CAST(max(n) AS BIGINT) AS requests
      |FROM cum GROUP BY 1""".stripMargin))

  private val a19 = Q(
    "a19_sample_quantiles",
    // Quantiles from a DETERMINISTIC bounded-state sample — the third point
    // on the percentile cost spectrum (a08 exact full-sort, a15 fixed
    // histogram, here: b24's bottom-k-by-hash reservoir): 256 smallest-
    // md5(log_id) rows per resource ARE a uniform row sample (the hash is
    // the random permutation, log_id unique ⇒ duplicates of the value
    // survive), flowing through O(k) mergeable partial aggregation, then
    // inverse-CDF picks on the sorted sample (a15's discipline — integer
    // results, no interpolation, so the oracle reproduces the estimate
    // EXACTLY, like b23's checked KMV estimator). Exact count rides along.
    (s, dir) => {
      val agg = operators.Kmv.hash_sample(256)
      def pick(q: Double) = element_at(col("vs"),
        ceil(lit(q) * size(col("vs"))).cast("int"))
      httpLog(s, dir)
        .select(col("resource_id"),
          md5(col("log_id").cast("string").cast("binary")).as("h"),
          col("request_time_milli"))
        .groupBy("resource_id")
        .agg(agg(col("h"), col("request_time_milli")).as("sample"),
          count(lit(1)).as("requests"))
        .withColumn("vs",
          sort_array(expr("transform(sample, e -> CAST(e.payload AS BIGINT))")))
        .select(col("resource_id"),
          pick(0.5).as("p50_est"), pick(0.95).as("p95_est"),
          pick(0.99).as("p99_est"),
          size(col("vs")).as("sample_n"), col("requests"))
    },
    Some(s"""${HttpLog.cte},
      |ranked AS (
      |  SELECT resource_id, request_time_milli,
      |         row_number() OVER (PARTITION BY resource_id
      |           ORDER BY md5(CAST(log_id AS VARCHAR))) AS hr
      |  FROM http_log),
      |vs AS (
      |  SELECT resource_id, request_time_milli AS v,
      |         row_number() OVER (PARTITION BY resource_id
      |           ORDER BY request_time_milli) AS rn,
      |         count(*) OVER (PARTITION BY resource_id) AS n
      |  FROM ranked WHERE hr <= 256),
      |q AS (
      |  SELECT resource_id,
      |         min(CASE WHEN rn >= ceil(0.5 * n) THEN v END) AS p50_est,
      |         min(CASE WHEN rn >= ceil(0.95 * n) THEN v END) AS p95_est,
      |         min(CASE WHEN rn >= ceil(0.99 * n) THEN v END) AS p99_est,
      |         CAST(max(n) AS INT) AS sample_n
      |  FROM vs GROUP BY 1),
      |tot AS (SELECT resource_id, count(*) AS requests FROM http_log GROUP BY 1)
      |SELECT q.resource_id, p50_est, p95_est, p99_est, sample_n, requests
      |FROM q JOIN tot USING (resource_id)""".stripMargin))

  private val a20 = Q(
    "a20_hilbert_curve",
    // a17's locality upgrade: the Hilbert index over the same
    // (resource_id, bytes_sent) plane — a CONTINUOUS curve (every
    // consecutive index is a unit Manhattan step, proven exhaustively in
    // LayoutSpec; Z jumps diagonally at power-of-two seams), so contiguous
    // index ranges cover tighter blocks and range scans touch fewer files.
    // Built as 20 fenced per-bit rotation levels (codegen'd conditionals;
    // the fence stops CollapseProject from inlining the chain into an
    // exponential expression), mirrored level-by-level in SQL CTEs.
    (s, dir) => graft.operators.Layout.withHilbertValue(
      httpLog(s, dir).select(col("log_id"), col("resource_id"), col("bytes_sent")),
      20, col("resource_id"), col("bytes_sent"), "hval")
      .select(col("log_id"), col("hval")),
    Some(s"""${HttpLog.cte},
      |${graft.operators.Layout.hilbertSqlCtes(
             20, "http_log", "log_id", "resource_id", "bytes_sent")}
      |SELECT log_id, hd AS hval FROM h20""".stripMargin))

  private val a21 = Q(
    "a21_capacity_estimate",
    // The reference README's sizing task ("estimate of disk space required
    // given average incoming message rate and retention",
    // reference/README.md:63-66) as a registered row: measure the rollup's
    // cardinality compression on the sample (|a04 totals| / |raw logs|),
    // extrapolate to 1k msg/s over 90 days at the measured ~64 B/agg-row
    // parquet footprint (operators/Capacity.scala). Every arithmetic step
    // is mirrored exactly: the one double op (rate × compression) is the
    // same IEEE multiply in both engines, truncated toward zero (.toLong /
    // trunc), and everything else is BIGINT.
    (s, dir) => {
      import s.implicits._
      val est = operators.Capacity.estimate(
        httpLog(s, dir), a04.fn(s, dir), msgsPerSecond = 1000, retentionDays = 90)
      Seq((est.rawRowsPerDay, est.aggRowsPerDay, est.aggBytesPerDay,
        est.retentionDays, est.totalBytes))
        .toDF("raw_rows_per_day", "agg_rows_per_day", "agg_bytes_per_day",
          "retention_days", "total_bytes")
    },
    Some(s"""${HttpLog.cte}
      |, agg AS (
      |  SELECT resource_id, response_status, cache_status, remote_addr,
      |         date_trunc('hour', ts) AS ts_hour
      |  FROM http_log GROUP BY 1, 2, 3, 4, 5),
      |n AS (SELECT (SELECT count(*) FROM http_log) AS rawn,
      |             (SELECT count(*) FROM agg) AS aggn),
      |e AS (SELECT CAST(86400000 AS BIGINT) AS raw_rows_per_day,
      |             CAST(trunc(86400000 * (CAST(aggn AS DOUBLE) / rawn))
      |                  AS BIGINT) AS agg_rows_per_day
      |      FROM n)
      |SELECT raw_rows_per_day, agg_rows_per_day,
      |       agg_rows_per_day * 64 AS agg_bytes_per_day,
      |       CAST(90 AS INT) AS retention_days,
      |       agg_rows_per_day * 64 * 90 AS total_bytes
      |FROM e""".stripMargin))

  private val a22 = Q(
    "a22_compact_small_files",
    // Small-file compaction (the OPTIMIZE bin-packing maintenance pass,
    // Layout.compact) as a registered row: the totals table lands as 32
    // deliberately-tiny files (the streaming-sink fragmentation the pass
    // exists for), compact() bin-packs them — with a 1 GiB target every
    // file is under the small threshold and the packing is closed-form:
    // ceil(total/1 GiB) = exactly ONE output file. The returned frame
    // re-reads the compacted table, so the hash certifies the swap lost no
    // rows and the stats match the closed-form file counts; crash-safety
    // and idempotence of the rename protocol stay pinned in LayoutSpec.
    (s, dir) => {
      val tmp = operators.Scratch.dir("a22") + "/totals"
      a04.fn(s, dir).repartition(32)
        .write.mode("overwrite").parquet(tmp)
      val stats = operators.Layout.compact(s, tmp, targetBytes = 1L << 30)
      s.read.parquet(tmp).agg(
        lit(stats.filesBefore).as("files_before"),
        lit(stats.filesAfter).as("files_after"),
        lit(stats.smallRewritten).as("files_rewritten"),
        count(lit(1)).as("rows_after"),
        sum("requests").as("requests_total"))
    },
    Some(s"""${HttpLog.cte}
      |, agg AS (
      |  SELECT resource_id, response_status, cache_status, remote_addr,
      |         date_trunc('hour', ts) AS ts_hour, count(*) AS requests
      |  FROM http_log GROUP BY 1, 2, 3, 4, 5)
      |SELECT CAST(32 AS INT) AS files_before, CAST(1 AS INT) AS files_after,
      |       CAST(32 AS INT) AS files_rewritten,
      |       count(*) AS rows_after, CAST(sum(requests) AS BIGINT) AS requests_total
      |FROM agg""".stripMargin))

  /** Physical nodes of a plan, descending through AQE wrappers. */
  private def physicalNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p +: (p match {
      case a: AdaptiveSparkPlanExec => physicalNodes(a.executedPlan)
      case q: QueryStageExec => physicalNodes(q.plan)
      case other => other.children.flatMap(physicalNodes)
    })
  }

  private val a23 = Q(
    "a23_totals_partitioned",
    // The reference's serving-table layout as a registered row (r9 verdict
    // task #4): totals written PARTITION BY toYYYYMM + sorted by the
    // serving key (http_log.rs:105-107 → TotalsTable.write), then ONE
    // month re-read. The testdata spans a single month, so a second month
    // is PLANTED (every total re-dated +1 month) to make the pruning
    // real: the gate asserts ≥2 ym partitions exist on disk AND that the
    // month predicate reaches the scan as a PartitionFilter — file-
    // listing-level skipping, the property that makes "seconds at best"
    // hold at 100 TB. A broken pruning filter would also leak the planted
    // February rows into the output and redden the hash. The `observe`
    // metrics (reference telemetry.rs's processed-rows/bytes counters)
    // ride the same read — no side channel, no extra pass — and are
    // emitted as columns the oracle checks against its own counts.
    //
    // Disk-trust discipline (the r10/r11 driver-red lesson — this was the
    // one gate whose EMITTED values round-tripped through a self-written
    // table, and it hash-reddened in the driver twice while staying green
    // locally; the r11 (rows, bytes) require never fired, so count+sum
    // granularity was proven too coarse): since r12 nothing read back from
    // disk reaches the dumped parquet AT ALL —
    // (1) the readback must be multiset-EQUAL to the pre-write frame over
    //     ALL columns (EXCEPT ALL both ways, empty both ways); a future
    //     divergence names its rows in the error or is impossible;
    // (2) `ym` is re-derived IN-QUERY from ts_hour on BOTH sides, never
    //     the partition-directory value round-tripped through schema
    //     inference, so a rendering skew (the one session-TZ-sensitive
    //     surface) surfaces as an inequality, not a silent agreement;
    // (3) the RETURNED frame is the pre-write month frame (+ the verified
    //     observe scalars) — the same purely-deterministic lineage as
    //     hash-green a04. The layout claims (≥2 ym partitions on disk,
    //     PartitionFilters pruning at the listing level, observe counters
    //     riding the disk read) stay certified by in-gate requires; a
    //     driver-side disk/readback anomaly can only raise a NAMED error,
    //     never redden a hash.
    // (4) a forensic sidecar (per-column min/max + order-insensitive
    //     xxhash64 checksums of BOTH frames, plus tmpdir/TZ/partition
    //     listing) is written next to the Verify output IF AND ONLY IF a
    //     disk-trust require is about to fail, so a red localizes its
    //     divergent column from the artifact alone without polluting the
    //     green-path artifact set (r12 verdict task #4 — the always-on
    //     sidecar read as a stray no_oracle row in the driver's gate).
    //     Postscript: the three-round red this machinery hunted turned out
    //     to be an ORACLE typing slip (uncast DuckDB sum → HUGEINT →
    //     float64; fixed with the CAST below) — the Spark side and this
    //     discipline were correct all along; they stay as the guard they
    //     were built to be.
    // Scratch roots are per-(user, process) since r11, removing the
    // cross-process aliasing window.
    (s, dir) => {
      val path = operators.Scratch.dir("a23") + "/totals"
      val totals = a04.fn(s, dir)
      val planted = totals.unionByName(
        totals.withColumn("ts_hour", expr("timestampadd(MONTH, 1, ts_hour)")))
      operators.TotalsTable.write(planted, path)
      val yms = new java.io.File(path).list().filter(_.startsWith("ym=")).sorted
      require(yms.length >= 2,
        s"planted month missing: partitions ${yms.mkString(",")}")
      val ym0 = yms.head.stripPrefix("ym=")
      // the pre-write month frame: a04's deterministic lineage + in-query ym
      val expected = totals
        .withColumn("ym", date_format(col("ts_hour"), "yyyyMM"))
        .filter(col("ym") === ym0)
        .persist()
      val month = operators.TotalsTable.readMonth(s, path, ym0)
      val scans = physicalNodes(month.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      require(scans.nonEmpty && scans.forall(
        _.partitionFilters.exists(_.references.exists(_.name == "ym"))),
        s"ym must prune at the listing level, plan:\n${month.queryExecution.executedPlan}")
      // readback aligned to the pre-write shape, ym re-derived in-query
      val readback = month.select(totals.columns.map(col).toSeq :+
        date_format(col("ts_hour"), "yyyyMM").as("ym"): _*)
      val (obsRows, obsBytes) = try {
        // r11 verdict task #1a: FULL-content multiset round-trip equality
        // (DiskTrustSpec pins the red path: a divergence NAMES its rows)
        operators.DiskTrust.requireMultisetEqual(readback, expected,
          s"a23 disk round-trip diverged from the frame that wrote it at $path")
        // the observe counters (reference telemetry.rs's processed-rows/bytes)
        // still ride the DISK read — the telemetry claim stays on the readback
        val obs = org.apache.spark.sql.Observation()
        readback.observe(obs, count(lit(1)).as("rows"), sum("total_bytes").as("bytes"))
          .write.format("noop").mode("overwrite").save()
        val (oRows, oBytes) =
          (obs.get("rows").asInstanceOf[Long], obs.get("bytes").asInstanceOf[Long])
        val expect = expected.agg(count(lit(1)), sum("total_bytes")).head()
        require(oRows == expect.getLong(0) && oBytes == expect.getLong(1),
          s"a23 observed counters diverged: re-read (rows=$oRows, bytes=$oBytes) " +
            s"vs pre-write (rows=${expect.getLong(0)}, bytes=${expect.getLong(1)}) at $path")
        (oRows, oBytes)
      } catch { case scala.util.control.NonFatal(e) =>
        // failure path ONLY (NonFatal: an OOM/fatal JVM error must
        // propagate immediately, not trigger further Spark jobs): record
        // the per-column evidence next to the Verify output, then rethrow
        // — the gate stays loud, the artifact set stays clean on green
        // runs. The sidecar write is best-effort: it must never mask the
        // gate's own error (its aggregates read the same frames that just
        // failed, so it can share the root cause).
        try {
          val sidecar = operators.DiskTrust.forensicSidecar(s,
            Seq("pre_write" -> expected, "readback" -> readback),
            Seq("scratch_path" -> path, "ym_partitions" -> yms.mkString(","),
              "ym0" -> ym0,
              "java.io.tmpdir" -> sys.props("java.io.tmpdir"),
              "session_timeZone" -> s.conf.get("spark.sql.session.timeZone"),
              "jvm_default_tz" -> java.util.TimeZone.getDefault.getID),
            "a23_forensics_sidecar")
          System.err.println(s"[a23] disk-trust failure; forensics at $sidecar")
        } catch { case scala.util.control.NonFatal(side) =>
          System.err.println(s"[a23] forensic sidecar write also failed: $side")
        }
        throw e
      } finally expected.unpersist()
      // r11 verdict task #1b: emit the PRE-WRITE lineage (proven equal above;
      // the cache is released above — the dump recomputes the cheap a04
      // month lineage, it never re-touches the scratch table)
      expected.select(col("*"),
        lit(obsRows).as("obs_rows"), lit(obsBytes).as("obs_bytes"))
    },
    Some(s"""${HttpLog.cte}
      |, agg AS (
      |  SELECT resource_id, response_status, cache_status, remote_addr,
      |         date_trunc('hour', ts) AS ts_hour,
      |         count(*) AS requests,
      |         CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |         CAST(sum(request_time_milli) AS BIGINT) AS total_time_milli
      |  FROM http_log GROUP BY 1, 2, 3, 4, 5),
      |t AS (SELECT *, strftime(ts_hour, '%Y%m') AS ym FROM agg),
      |m0 AS (SELECT min(ym) AS ym0 FROM t),
      |mt AS (SELECT t.* FROM t, m0 WHERE t.ym = m0.ym0)
      |SELECT resource_id, response_status, cache_status, remote_addr,
      |       ts_hour, requests, total_bytes, total_time_milli, ym,
      |       (SELECT count(*) FROM mt) AS obs_rows,
      |       CAST((SELECT sum(total_bytes) FROM mt) AS BIGINT) AS obs_bytes
      |FROM mt""".stripMargin))

  private val a24 = Q(
    "a24_idempotent_collapse",
    // The CollapseIdempotent optimizer rule through a gated row (r9
    // verdict task #8, the a22 promotion pattern): the flagship's
    // anonymize-on-ingest composed with a defensive downstream re-apply —
    // the redundancy the rule exists to delete (at 100 TB the second pass
    // is a full extra string scan per row for a provable no-op). The gate
    // asserts the rule FIRED: the optimized plan carries exactly ONE
    // AnonymizeIp and no nested application; the hash then certifies the
    // collapsed plan computes the right answer (idempotence means the
    // single-application oracle is exact).
    (s, dir) => {
      GraftFunctions.register(s) // installs the optimizer rule (idempotent)
      val df = httpLog(s, dir)
        .withColumn("remote_addr", graft.functions.anonymize_ip(col("remote_addr")))
        .withColumn("remote_addr", graft.functions.anonymize_ip(col("remote_addr")))
        .groupBy(col("remote_addr"))
        .agg(count(lit(1)).as("requests"), sum("bytes_sent").as("total_bytes"))
      import org.apache.spark.sql.graft.AnonymizeIp
      var total = 0; var nested = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case AnonymizeIp(inner) =>
          total += 1
          if (inner.isInstanceOf[AnonymizeIp]) nested += 1
        case _ =>
      }))
      require(total == 1 && nested == 0,
        s"CollapseIdempotent must fire: $total applications, $nested nested")
      df
    },
    Some(s"""${HttpLog.cte}
      |SELECT $anonV4Sql AS remote_addr, count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
      |FROM http_log GROUP BY 1""".stripMargin))

  private val a16 = Q(
    "a16_gapfill_timeseries",
    (s, dir) => {
      // Dashboard gap-fill (ClickHouse WITH FILL / Grafana $__timeGroup):
      // every hour in each resource's active span gets a row, zero-filled
      // where no traffic was recorded, with an is_gap marker. Catalyst
      // collapses the span derivation (groupBy(resource,hour) then
      // groupBy(resource)) into ONE direct min/max aggregate over the scan,
      // and the hourly totals broadcast to the generated grid — two pruned
      // scans, no sort, no shuffled join (verified in PLANS-style review).
      val totals = httpLog(s, dir)
        .groupBy(col("resource_id"), date_trunc("hour", col("ts")).as("ts_hour"))
        .agg(count(lit(1)).as("requests"), sum("bytes_sent").as("total_bytes"))
      val grid = totals.groupBy("resource_id")
        .agg(min("ts_hour").as("h0"), max("ts_hour").as("h1"))
        .select(col("resource_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("ts_hour"))
      grid.join(totals, Seq("resource_id", "ts_hour"), "left_outer")
        .select(col("resource_id"), col("ts_hour"),
          coalesce(col("requests"), lit(0L)).as("requests"),
          coalesce(col("total_bytes"), lit(0L)).as("total_bytes"),
          when(col("requests").isNull, 1).otherwise(0).cast("int").as("is_gap"))
    },
    Some(s"""${HttpLog.cte}
      |, t AS (
      |  SELECT resource_id, date_trunc('hour', ts) AS ts_hour,
      |         count(*) AS requests, CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
      |  FROM http_log GROUP BY 1, 2),
      |grid AS (
      |  SELECT resource_id,
      |         unnest(generate_series(min(ts_hour), max(ts_hour),
      |                                INTERVAL 1 HOUR)) AS ts_hour
      |  FROM t GROUP BY resource_id)
      |SELECT g.resource_id, g.ts_hour,
      |       coalesce(t.requests, 0) AS requests,
      |       coalesce(t.total_bytes, 0) AS total_bytes,
      |       CASE WHEN t.requests IS NULL THEN 1 ELSE 0 END AS is_gap
      |FROM grid g LEFT JOIN t
      |  ON g.resource_id = t.resource_id AND g.ts_hour = t.ts_hour""".stripMargin))

  private val a17 = Q(
    "a17_zorder_curve",
    // The z-value that [[graft.operators.Layout.writeZOrdered]] clusters on
    // — Morton interleave of (resource_id, bytes_sent), pure codegen'd bit
    // arithmetic. The layout rewrite itself is a write-side effect
    // (LayoutSpec proves the file-skipping win on both dimensions); the
    // curve is the deterministic, hash-checkable part.
    // 20 bits/dim: bytes_sent spans ~2^19 in the synthetic data, and 2×20
    // bits still fits a long with headroom
    (s, dir) => httpLog(s, dir).select(
      col("log_id"),
      graft.operators.Layout.zvalue(20, col("resource_id"), col("bytes_sent")).as("zval")),
    Some(s"""${HttpLog.cte}
      |SELECT log_id,
      |       ${graft.operators.Layout.zvalueSql(20, "resource_id", "bytes_sent")} AS zval
      |FROM http_log""".stripMargin))

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
      // r22 (VERDICT #6): the b09-style dim-first reorder was probed and
      // REJECTED — resolve nation INTO customer first (dim⋈dim broadcast),
      // then join the enriched dim to the fact chain. Unlike b09 there is
      // no selective filter here (every nation survives), so the reorder
      // cannot prune the big side; AbProbe (8 reps, interleaved) read the
      // reorder 1.08× WORSE on mins (0.558 vs 0.519; medians 0.644 vs
      // 0.580). The committed shape stays the r20 one; the probed
      // alternative stays reachable under -Dgraft.b02order=off as the
      // measurement hook and the negative-result record.
      val joined =
        if (sys.props.get("graft.b02order").contains("off"))
          li.join(o, col("l_orderkey") === col("o_orderkey"))
            .join(c.join(broadcast(n), col("c_nationkey") === col("n_nationkey")),
              col("o_custkey") === col("c_custkey"))
        else
          li.join(o, col("l_orderkey") === col("o_orderkey"))
            .join(c, col("o_custkey") === col("c_custkey"))
            .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      joined
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

  private val b03 = Q(
    "b03_brand_volume",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum("l_quantity"), 2).as("volume"),
          round(sum("l_extendedprice"), 2).as("gross"),
          count(lit(1)).as("line_cnt")),
    Some("""SELECT p_brand,
      |       round(sum(l_quantity), 2) AS volume,
      |       round(sum(l_extendedprice), 2) AS gross,
      |       count(*) AS line_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin))

  private val b04 = Q(
    "b04_top_orders_per_cust",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         CAST(row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
      |  FROM orders) WHERE rank <= 3""".stripMargin))

  private val b05 = Q(
    "b05_cust_wo_urgent",
    (s, dir) =>
      // anti join with a pushed-down filter on the probe side
      Tables.customer(s, dir)
        .join(
          Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
    Some("""SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin))

  private val b06 = Q(
    "b06_distinct_users",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("events"),
          round(sum("value"), 2).as("total_value")),
    Some("""SELECT event_type,
      |       count(DISTINCT user_id) AS users,
      |       count(*) AS events,
      |       round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1""".stripMargin))

  private val b07 = Q(
    "b07_priority_pivot",
    (s, dir) => {
      def cnt(p: String) = sum(when(col("o_orderpriority") === p, 1L).otherwise(0L))
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          cnt("1-URGENT").as("urgent"),
          cnt("2-HIGH").as("high"),
          cnt("3-MEDIUM").as("medium"),
          cnt("4-NOT SPECIFIED").as("unspecified"),
          cnt("5-LOW").as("low"),
          round(sum("o_totalprice"), 2).as("total_price"))
    },
    Some("""SELECT o_orderstatus,
      |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
      |       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
      |       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
      |       CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS unspecified,
      |       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM orders GROUP BY 1""".stripMargin))

  private val b08 = Q(
    "b08_shipping_priority",
    (s, dir) =>
      // TPC-H Q3 shape: selective filters on both sides of a fact-fact join,
      // top-N by aggregated revenue
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1997-01-01"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20),
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 20""".stripMargin))

  private val b09 = Q(
    "b09_local_supplier_volume",
    (s, dir) => {
      // TPC-H Q5 shape: 6-table join, tiny dims broadcast. r21: the region
      // filter — the query's only selective predicate (1/5 of nations) — is
      // resolved into an ASIA-suppliers dim FIRST and joined to lineitem
      // BEFORE the fact-to-fact joins, so ~4/5 of lineitem rows drop before
      // they cross the orders/customer joins (guide §3.2: reduce the big
      // side first; inner joins commute, so the result multiset is
      // unchanged). -Dgraft.b09order=off restores the old order (A/B hook).
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      if (sys.props.get("graft.b09order").contains("off"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(su),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("line_cnt"))
      else {
        val suAsia = su
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
        li.join(broadcast(suAsia), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("line_cnt"))
      }
    },
    Some("""SELECT n_name AS nation,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS line_cnt
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin),
    bench = true)

  private val b10 = Q(
    "b10_volume_shipping",
    (s, dir) => {
      // TPC-H Q7 shape: nation self-referenced twice (supplier vs customer
      // side), yearly trade volume between two fixed nations
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir).select(
        col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).select(
        col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("volume"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS INT) AS l_year,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
      |FROM lineitem
      |JOIN orders    ON l_orderkey = o_orderkey
      |JOIN customer  ON o_custkey = c_custkey
      |JOIN supplier  ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3""".stripMargin))

  private val b11 = Q(
    "b11_topk_urls",
    (s, dir) => {
      // top-3 URLs by traffic per resource through the k-bounded custom
      // aggregate (operators.TopK) — partial aggregation instead of a
      // whole-partition window sort; oracle is the window formulation
      val perUrl = httpLog(s, dir)
        .groupBy("resource_id", "url")
        .agg(sum("bytes_sent").as("url_bytes"))
      val agg = operators.TopK.top_k(3)
      perUrl
        .groupBy("resource_id")
        .agg(agg(col("url"), col("url_bytes")).as("top"))
        .select(col("resource_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("resource_id"), (col("pos") + 1).cast("int").as("rank"),
          col("e.key").as("url"), col("e.value").as("total_bytes"))
    },
    Some(s"""WITH ${HttpLog.cteBody},
      |per_url AS (
      |  SELECT resource_id, url, CAST(sum(bytes_sent) AS BIGINT) AS url_bytes
      |  FROM http_log GROUP BY 1, 2),
      |ranked AS (
      |  SELECT resource_id, url, url_bytes,
      |         row_number() OVER (PARTITION BY resource_id
      |           ORDER BY url_bytes DESC, url) AS rn
      |  FROM per_url)
      |SELECT resource_id, CAST(rn AS INT) AS rank, url, url_bytes AS total_bytes
      |FROM ranked WHERE rn <= 3""".stripMargin))

  private val b12 = Q(
    "b12_product_profit",
    (s, dir) =>
      // TPC-H Q9 shape (adapted: no partsupp table in the testdata): profit
      // by nation and year for parts whose type matches a pattern
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type").contains("PROMO"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("profit")),
    Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_type LIKE '%PROMO%'
      |GROUP BY 1, 2""".stripMargin))

  private val b13 = Q(
    "b13_loyal_customers",
    (s, dir) => {
      // relational division: customers with ≥1 order, ALL of them finished
      // ('F') — semi join for existence, anti join against violators
      val o = Tables.orders(s, dir)
      Tables.customer(s, dir)
        .join(o.select("o_custkey").distinct(), col("c_custkey") === col("o_custkey"), "left_semi")
        .join(o.filter(col("o_orderstatus") =!= "F").select(col("o_custkey").as("viol")),
          col("c_custkey") === col("viol"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus <> 'F')""".stripMargin))

  private val b14 = Q(
    "b14_sole_late_supplier",
    (s, dir) => {
      // TPC-H Q21 shape, decorrelated: suppliers who were the ONLY late
      // shipper in a multi-supplier order. The correlated EXISTS/NOT EXISTS
      // pair becomes two distinct-count aggregates — one shuffle each,
      // instead of per-row subquery probes.
      val lo = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int").as("late"))
      val perOrder = lo.groupBy("l_orderkey").agg(
        countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
      val sole = lo.join(perOrder, "l_orderkey")
        .filter(col("late") === 1 && col("n_supp") >= 2 && col("late_supp") === 1)
        .select("l_orderkey", "l_suppkey").distinct()
      sole.join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
    },
    Some("""WITH lo AS (
      |  SELECT l_orderkey, l_suppkey,
      |         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |per_order AS (
      |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
      |         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      |  FROM lo GROUP BY 1),
      |sole AS (
      |  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
      |  FROM lo JOIN per_order USING (l_orderkey)
      |  WHERE late = 1 AND n_supp >= 2 AND late_supp = 1)
      |SELECT s_name, count(*) AS numwait
      |FROM sole JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin))

  private val b15 = Q(
    "b15_grouping_sets",
    (s, dir) =>
      // arbitrary GROUPING SETS (not a rollup chain — (status, priority),
      // (priority), () skips the (status) level): one pass, Spark's Expand
      // replicates rows per set before a single shuffle-agg. gid built from
      // grouping() flags so NULL group values stay distinguishable from the
      // aggregated-away level.
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("int").as("gid"),
          count(lit(1)).as("orders_cnt"),
          round(sum("o_totalprice"), 2).as("total_price")),
    Some("""SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
      |       count(*) AS orders_cnt,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())""".stripMargin))

  private val b16 = Q(
    "b16_inflight_by_day",
    (s, dir) => {
      // interval (range) join: lineitems in flight (ordered but not yet
      // shipped) on each sampled day. The probe side is 12 rows — a broadcast
      // nested-loop join IS the right plan here: ≤12× row amplification
      // straight into a partial agg, no shuffle of the fact table at all.
      val days = s.sql(
        """SELECT explode(sequence(
          |  to_date('1996-01-01'), to_date('1996-12-01'), interval 1 month)) AS d"""
          .stripMargin)
        .select(col("d").cast("timestamp").as("d"))
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity", "l_shipdate")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(days),
          col("o_orderdate") <= col("d") && col("d") < col("l_shipdate"))
        .groupBy("d")
        .agg(count(lit(1)).as("in_flight"),
          round(sum("l_quantity"), 2).as("qty_in_flight"))
    },
    Some("""WITH days AS (
      |  SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
      |                                TIMESTAMP '1996-12-01', INTERVAL 1 MONTH)) AS d)
      |SELECT d, count(*) AS in_flight, round(sum(l_quantity), 2) AS qty_in_flight
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN days ON o_orderdate <= d AND d < l_shipdate
      |GROUP BY 1""".stripMargin))

  private val b17 = Q(
    "b17_cust_order_distribution",
    (s, dir) =>
      // TPC-H Q13 shape: how many customers placed exactly N orders — a LEFT
      // OUTER join so zero-order customers land in the N=0 bucket, then two
      // aggregations. The first groupBy is on the join key, so the sort-merge
      // join's partitioning is reused and only the (tiny) second histogram
      // agg shuffles again.
      Tables.customer(s, dir).select("c_custkey")
        .join(Tables.orders(s, dir).select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count")) // count() skips the outer-join NULLs
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist")),
    Some("""SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin))

  private val b18 = Q(
    "b18_min_cost_supplier",
    (s, dir) => {
      // TPC-H Q2 shape (adapted: observed min unit price over lineitem plays
      // partsupp.ps_supplycost): for every STANDARD part, the supplier(s)
      // offering it cheapest. The correlated `cost = (SELECT min …)` subquery
      // is decorrelated into one per-(part,supp) aggregate + a per-part min
      // joined back — two map-side-combined aggs and an equi-join instead of
      // a per-row subquery probe.
      val cost = Tables.lineitem(s, dir)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val pc = cost.join(
        broadcast(Tables.part(s, dir).filter(col("p_type") === "STANDARD")
          .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      // per-part min as a window over the ALREADY-AGGREGATED (part, supp)
      // frame — an agg+join-back here would re-derive the whole cost subtree
      // (Catalyst doesn't CSE subplans), scanning lineitem twice; the window
      // runs over a frame that is orders of magnitude smaller than the fact
      pc.withColumn("min_cost",
          min("cost").over(Window.partitionBy("p_partkey")))
        // exact double equality is safe: both sides are the min over the
        // identical per-(part,supp) aggregate values
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        // floor-scaled, not round(…, 4): both engines hold the identical
        // IEEE double, but round-half at the 4th decimal resolves
        // differently (BigDecimal HALF_UP vs float scaling) on boundary
        // values — floor of the same double is always identical
        .select(col("p_partkey"), col("s_name"),
          floor(col("min_cost") * 10000).cast("long").as("unit_cost_e4"))
    },
    Some("""WITH cost AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |pc AS (
      |  SELECT p_partkey, l_suppkey, cost
      |  FROM cost JOIN part ON l_partkey = p_partkey WHERE p_type = 'STANDARD'),
      |m AS (SELECT p_partkey, min(cost) AS min_cost FROM pc GROUP BY 1)
      |SELECT p_partkey, s_name,
      |       CAST(floor(min_cost * 10000) AS BIGINT) AS unit_cost_e4
      |FROM pc JOIN m USING (p_partkey) JOIN supplier ON l_suppkey = s_suppkey
      |WHERE cost = min_cost""".stripMargin))

  private val b19 = Q(
    "b19_small_qty_revenue",
    (s, dir) => {
      // TPC-H Q17 shape: revenue lost to small-quantity Brand#3 orders —
      // lineitems under 20% of their part's average quantity. The correlated
      // scalar `0.2 * (SELECT avg …)` decorrelates into a per-part aggregate
      // joined back. The brand filter is applied BEFORE the threshold agg:
      // it selects whole parts, so the per-part average over the filtered
      // set is identical — and the fact table is scanned pre-shrunk.
      val brand = Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#3").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      // per-part threshold as a window over the brand-filtered frame — an
      // agg+join-back would re-derive the scan+join subtree (no subplan
      // CSE), reading the fact table twice (same discipline as b18/b27)
      brand.withColumn("qty_thresh",
          avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2)
        .filter(col("l_quantity") < col("qty_thresh"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("line_cnt"))
    },
    Some("""WITH brand AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3'),
      |t AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      |      FROM brand GROUP BY 1)
      |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
      |       count(*) AS line_cnt
      |FROM brand JOIN t USING (l_partkey)
      |WHERE l_quantity < qty_thresh""".stripMargin))

  private val b20 = Q(
    "b20_disjunctive_revenue",
    (s, dir) => {
      // TPC-H Q19 shape: revenue under a disjunction of (brand, size,
      // quantity) bands. The brand/size half of each disjunct is hoisted
      // into a part-side prefilter (implied by the OR, but Catalyst can't
      // always extract it) so the broadcast build side ships only candidate
      // parts; the full disjunction is then evaluated post-join in one
      // codegen'd predicate.
      val partSide = Tables.part(s, dir).filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50)))
        .select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(partSide), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("line_cnt"))
    },
    Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS line_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)"""
      .stripMargin))

  private val b21 = Q(
    "b21_red_part_suppliers",
    (s, dir) => {
      // TPC-H Q20 shape: suppliers who moved a significant volume (>100
      // units) of red parts. The reference formulation is a doubly-nested
      // IN/EXISTS; decorrelated here to aggregate-then-join: shipped
      // quantity per supplier over red parts (one map-side-combined agg),
      // thresholded, then joined to supplier. The aggregated side is tiny —
      // broadcast, so the supplier table never shuffles.
      val red = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").startsWith("red")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(sum("l_quantity").as("red_qty"))
        .filter(col("red_qty") > 100)
      Tables.supplier(s, dir)
        .join(broadcast(red), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_name"), round(col("red_qty"), 2).as("red_qty"))
    },
    Some("""WITH q AS (
      |  SELECT l_suppkey, sum(l_quantity) AS red_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY 1 HAVING sum(l_quantity) > 100)
      |SELECT s_name, round(red_qty, 2) AS red_qty
      |FROM supplier JOIN q ON s_suppkey = l_suppkey""".stripMargin))

  private val b22 = Q(
    "b22_dormant_customers",
    (s, dir) => {
      // TPC-H Q22 shape: above-average-balance customers with no RECENT
      // orders, by nation. The scalar-subquery threshold rides the plan as a
      // broadcast 1-row cross join (no driver-side collect); the NOT EXISTS
      // is a left anti join against the distinct recent-order customer set.
      val thresh = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("bal_thresh"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-09-01").cast("timestamp"))
        .select("o_custkey").distinct()
      Tables.customer(s, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("bal_thresh"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
    },
    Some("""WITH th AS (SELECT avg(c_acctbal) AS bal_thresh
      |            FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |       round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer, th
      |WHERE c_acctbal > bal_thresh
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-09-01')
      |GROUP BY 1""".stripMargin))

  /** The DuckDB mirror of [[operators.Kmv.estimate]]'s 13-hex-char integer:
    * Σ digit(i)·16^(13−i) as exact BIGINT terms (each multiplier is a power
    * of two, the total < 2^52 — exactly representable when cast to DOUBLE).
    */
  private def kmvDigitSumOf(colName: String): String = (1 to 13).map { i =>
    s"(strpos('0123456789abcdef', substr($colName, $i, 1)) - 1) * ${1L << (4 * (13 - i))}"
  }.mkString(" + ")

  private val kmvDigitSum: String = kmvDigitSumOf("kth_hash")

  /** Oracle for the per-event-type KMV sketch over md5(user_id) — shared
    * verbatim by b23 (batch) and g17 (streamed): the sketch is
    * set-deterministic, so stream == batch IS the registered claim.
    */
  private def kmvUserByTypeOracle: String =
    s"""WITH hashes AS (
      |  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, h,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS nd
      |  FROM hashes),
      |grp AS (
      |  SELECT event_type, max(nd) AS nd,
      |         max(CASE WHEN rn = 64 THEN h END) AS kth_hash
      |  FROM ranked GROUP BY 1)
      |SELECT event_type,
      |       CAST(least(nd, 64) AS BIGINT) AS n_tracked,
      |       kth_hash,
      |       CAST(CASE WHEN nd < 64 THEN nd
      |            ELSE floor(63.0 / (CAST(greatest($kmvDigitSum, 1) AS DOUBLE)
      |                               / 4503599627370496.0))
      |            END AS BIGINT) AS est_distinct
      |FROM grp""".stripMargin

  /** Oracle for the per-event-type planted-top heavy hitter — shared
    * verbatim by b47 (batch) and g18 (streamed): the planted separation
    * makes the rank-1 identity merge-order-invariant, so the same exact
    * SQL adjudicates both postures.
    */
  private def hhPlantedTopOracle: String =
    """WITH vals AS (
      |  SELECT event_type,
      |         CASE WHEN event_id % 2 = 0
      |              THEN -(CAST(length(event_type) AS BIGINT) * 1000
      |                     + ascii(event_type))
      |              ELSE user_id END AS v
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, v,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY count(*) DESC, v) AS rn
      |  FROM vals GROUP BY event_type, v)
      |SELECT event_type, v AS top_value, CAST(8 AS INT) AS n_tracked
      |FROM ranked WHERE rn = 1""".stripMargin

  private val b23 = Q(
    "b23_kmv_distinct",
    (s, dir) => {
      // KMV bottom-k distinct sketch vs b06's exact countDistinct: O(k)
      // state per group through normal partial aggregation instead of
      // shuffling every distinct value — the 100 TB distinct-count posture.
      // Fully deterministic (md5 order + exact 52-bit θ arithmetic), so the
      // oracle mirrors the entire sketch INCLUDING the estimate.
      val agg = operators.Kmv.kmv_distinct(64)
      Tables.events(s, dir)
        .select(col("event_type"),
          md5(col("user_id").cast("string").cast("binary")).as("h"))
        .groupBy("event_type")
        .agg(agg(col("h")).as("r"))
        .select(col("event_type"), col("r.n_tracked").as("n_tracked"),
          col("r.kth_hash").as("kth_hash"), col("r.est_distinct").as("est_distinct"))
    },
    Some(kmvUserByTypeOracle))

  private val b24 = Q(
    "b24_hash_sample",
    (s, dir) => {
      // Deterministic uniform per-group sample: the 8 smallest-md5 distinct
      // users per event type (the hash IS the random permutation). Exact-k
      // per group with O(k) mergeable state — the bounded-cost reservoir at
      // 100 TB; deterministic, so the oracle reproduces the sample exactly.
      val agg = operators.Kmv.hash_sample(8)
      Tables.events(s, dir)
        .select(col("event_type"),
          md5(col("user_id").cast("string").cast("binary")).as("h"),
          col("user_id"))
        .groupBy("event_type")
        .agg(agg(col("h"), col("user_id")).as("sample"))
        .select(col("event_type"), posexplode(col("sample")).as(Seq("pos", "e")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("e.payload").as("user_id"))
    },
    Some("""WITH hashes AS (
      |  SELECT DISTINCT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, user_id,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
      |  FROM hashes)
      |SELECT event_type, CAST(rank AS INT) AS rank, user_id
      |FROM ranked WHERE rank <= 8""".stripMargin))

  private val b35 = Q(
    "b35_kmv_setops",
    (s, dir) => {
      // KMV set algebra — why theta sketches exist in OLAP: per-dimension
      // sketches compose into union/intersection distinct estimates without
      // re-scanning (|A∩B| = |A| + |B| − |A∪B| on the estimates). ONE scan
      // builds all three sketches: the per-set hash is nulled outside its
      // filter and the aggregator skips nulls.
      val agg = operators.Kmv.kmv_distinct(64)
      Tables.events(s, dir)
        .select(col("event_type"),
          md5(col("user_id").cast("string").cast("binary")).as("h"))
        .agg(
          agg(when(col("event_type") === "click", col("h"))).as("ra"),
          agg(when(col("event_type") === "view", col("h"))).as("rb"),
          agg(when(col("event_type").isin("click", "view"), col("h"))).as("ru"))
        .select(
          col("ra.est_distinct").as("est_click"),
          col("rb.est_distinct").as("est_view"),
          col("ru.est_distinct").as("est_union"),
          (col("ra.est_distinct") + col("rb.est_distinct") - col("ru.est_distinct"))
            .as("est_intersect"))
    },
    Some {
      // one ranked-hash CTE chain per set, each mirroring b23's estimator
      def estCte(name: String, where: String) =
        s"""${name}_h AS (
           |  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
           |  FROM events WHERE $where),
           |${name}_r AS (
           |  SELECT h, row_number() OVER (ORDER BY h) AS rn,
           |         count(*) OVER () AS nd
           |  FROM ${name}_h),
           |${name}_e AS (
           |  -- COALESCE mirrors Kmv.finish's empty-buffer path (0, not NULL)
           |  SELECT CAST(CASE WHEN COALESCE(max(nd), 0) < 64
           |       THEN COALESCE(max(nd), 0)
           |       ELSE floor(63.0 / (CAST(greatest(
           |              ${kmvDigitSumOf(s"max(CASE WHEN rn = 64 THEN h END)")}, 1)
           |              AS DOUBLE) / 4503599627370496.0))
           |       END AS BIGINT) AS est
           |  FROM ${name}_r)""".stripMargin
      s"""WITH ${estCte("a", "event_type = 'click'")},
         |${estCte("b", "event_type = 'view'")},
         |${estCte("u", "event_type IN ('click', 'view')")}
         |SELECT a_e.est AS est_click, b_e.est AS est_view, u_e.est AS est_union,
         |       a_e.est + b_e.est - u_e.est AS est_intersect
         |FROM a_e, b_e, u_e""".stripMargin
    })

  private val b25 = Q(
    "b25_late_order_priority",
    (s, dir) =>
      // TPC-H Q4 shape: orders with ≥1 late lineitem, counted by priority.
      // The correlated EXISTS is a left semi join with the date condition in
      // the join predicate — each order emits at most once, no distinct.
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_cnt")),
    Some("""SELECT o_orderpriority, count(*) AS order_cnt
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY 1""".stripMargin))

  private val b26 = Q(
    "b26_discount_band_revenue",
    (s, dir) =>
      // TPC-H Q6 shape: pure scan-filter-agg — the query whose whole plan
      // should be one codegen'd pass with every predicate in PushedFilters.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("line_cnt")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |       count(*) AS line_cnt
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin))

  private val b27 = Q(
    "b27_top_supplier",
    (s, dir) => {
      // TPC-H Q15 shape: supplier(s) with max quarterly revenue. The scalar
      // max is a 1-row global aggregate broadcast back over the per-supplier
      // frame: the max reduces through partial aggregates (constant bytes
      // per partition), and both consumers of `rev` canonicalize to the same
      // suppkey Exchange, so ReuseExchange scans lineitem once. The previous
      // `max over Window.partitionBy()` formulation shipped EVERY supplier
      // row to one partition — supplier cardinality scales with SF, so that
      // was this inventory's one genuine single-partition scale hazard
      // (surfaced by PlanGuardSpec's WindowExec warning). Revenue rounded
      // BEFORE the max compare, so tie semantics are decimal-exact in both
      // engines.
      val rev = Tables.lineitem(s, dir)
        // isnotnull(l_suppkey) is stated HERE, not left for the supplier
        // join to push down: the join pushes it into only its own subtree,
        // which would de-canonicalize the two rev consumers and block AQE's
        // runtime exchange reuse (one lineitem scan, not two)
        .filter(col("l_suppkey").isNotNull &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_rev"))
      rev.crossJoin(broadcast(rev.agg(max("total_rev").as("mx"))))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
    },
    Some("""WITH rev AS (
      |  SELECT l_suppkey,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin))

  private val b28 = Q(
    "b28_nation_rev_share",
    (s, dir) => {
      // TPC-H Q11 shape: nations whose supplier revenue exceeds a fraction
      // of the global total. The HAVING-against-global-scalar decorrelates
      // into a 1-row aggregate broadcast back over the 25-row nation frame
      // (same rewrite as b27; here the window formulation was only 25 rows,
      // but the agg+broadcast shape is single-partition-free and reuses the
      // nationkey Exchange for both consumers).
      val nv = Tables.lineitem(s, dir)
        // isnotnull(s_nationkey) stated here rather than pushed down by the
        // nation join into one consumer only — keeps both nv subtrees
        // canonically equal so AQE reuses the nationkey Exchange (b27's note)
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
          .filter(col("s_nationkey").isNotNull)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("v"))
      nv.crossJoin(broadcast(nv.agg(sum("v").as("t"))))
        .filter(col("v") > lit(0.04) * col("t"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), round(col("v"), 2).as("value"))
    },
    Some("""WITH nv AS (
      |  SELECT s_nationkey, sum(l_extendedprice * (1 - l_discount)) AS v
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1),
      |tot AS (SELECT sum(v) AS t FROM nv)
      |SELECT n_name AS nation, round(v, 2) AS value
      |FROM nv, tot
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE v > 0.04 * t""".stripMargin))

  private val b29 = Q(
    "b29_promo_rev_share",
    (s, dir) =>
      // TPC-H Q14 shape: promo revenue share for one month. Both sums are
      // rounded to cents BEFORE the ratio, and the share is floor-scaled —
      // round-half on a raw double ratio is engine-divergent (see b18).
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
            .as("promo_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          floor(lit(10000) * col("promo_rev") / col("total_rev")).cast("long")
            .as("promo_share_e4")),
    Some("""WITH agg AS (
      |  SELECT round(sum(CASE WHEN p_type = 'PROMO'
      |               THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-02-01')
      |SELECT promo_rev, total_rev,
      |       CAST(floor(10000 * promo_rev / total_rev) AS BIGINT) AS promo_share_e4
      |FROM agg""".stripMargin))

  private val b30 = Q(
    "b30_returned_top_customers",
    (s, dir) =>
      // TPC-H Q10 shape: top-20 customers by returned-item revenue.
      // Deterministic order: revenue desc then custkey — ties in the double
      // sums are broken by key in BOTH engines.
      Tables.customer(s, dir).select("c_custkey", "c_name")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .orderBy(desc("rev"), col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), round(col("rev"), 2).as("revenue")),
    Some("""SELECT c_custkey, c_name, round(rev, 2) AS revenue FROM (
      |  SELECT c_custkey, c_name,
      |         sum(l_extendedprice * (1 - l_discount)) AS rev
      |  FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY 1, 2
      |  ORDER BY rev DESC, c_custkey LIMIT 20)""".stripMargin))

  private val b31 = Q(
    "b31_shipmode_priority",
    (s, dir) =>
      // TPC-H Q12 shape: late lineitems split into high/low priority counts
      // per linestatus (conditional aggregation after a date-arithmetic join
      // predicate).
      Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate", "l_linestatus"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("low_line_count")),
    Some("""SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1""".stripMargin))

  private val b32 = Q(
    "b32_supplier_part_counts",
    (s, dir) =>
      // TPC-H Q16 shape: distinct suppliers per (brand, size) for selected
      // parts, excluding flagged suppliers — the NOT IN subquery is a left
      // anti join against the (tiny, broadcast) flagged-supplier set.
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt")),
    Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2""".stripMargin))

  private val b33 = Q(
    "b33_large_orders",
    (s, dir) => {
      // TPC-H Q18 shape: orders whose total quantity clears a threshold,
      // with customer detail. Quantities are integral doubles, so the sums
      // and the > compare are exact in both engines. The HAVING aggregate is
      // the only fact shuffle; orders join on its result, customer broadcast.
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          round(col("total_qty"), 2).as("total_qty"))
    },
    Some("""WITH big AS (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |       round(total_qty, 2) AS total_qty
      |FROM big
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin))

  private val b34 = Q(
    "b34_market_share",
    (s, dir) =>
      // TPC-H Q8 shape: one nation's yearly revenue share. Same numeric
      // discipline as b29: cents-rounded sums, floor-scaled ratio.
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("n_name") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
            .as("nation_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_rev"))
        .select(col("o_year"), col("nation_rev"), col("total_rev"),
          floor(lit(10000) * col("nation_rev") / col("total_rev")).cast("long")
            .as("share_e4")),
    Some("""WITH yr AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |         round(sum(CASE WHEN n_name = 'NATION_3'
      |               THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS nation_rev,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  GROUP BY 1)
      |SELECT o_year, nation_rev, total_rev,
      |       CAST(floor(10000 * nation_rev / total_rev) AS BIGINT) AS share_e4
      |FROM yr""".stripMargin))

  private val b36 = Q(
    "b36_window_analytics",
    // The analytic-window surface in one query: lag/lead, running sum,
    // sliding avg, ntile, cume_dist — per-user partitions ordered by
    // (ts, event_id) (event_id makes the order total, so frames are
    // deterministic). Partition-parallel: one Exchange on user_id, one
    // in-partition sort shared by every function.
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSlide = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .select(
          col("event_id"), col("user_id"),
          lag("event_id", 1).over(w).as("prev_event"),
          lead("event_id", 1).over(w).as("next_event"),
          round(sum("value").over(wRows), 4).as("running_value"),
          round(avg("value").over(wSlide), 4).as("sliding_avg3"),
          ntile(4).over(w).as("quartile"),
          round(cume_dist().over(w), 4).as("cd"))
    },
    Some("""SELECT event_id, user_id,
      |  lag(event_id, 1) OVER w AS prev_event,
      |  lead(event_id, 1) OVER w AS next_event,
      |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
      |  round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS sliding_avg3,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(cume_dist() OVER w, 4) AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin))

  private val b37 = Q(
    "b37_skew_report",
    // Key-skew diagnostics — the operational companion to a12's salted
    // aggregation: BEFORE deploying salting/AQE-skew config you measure
    // which keys are heavy and how heavy vs the key-count distribution.
    // One keyed agg (map-side combined) → tiny stats row broadcast back →
    // top-10 by (cnt, key) — agg-then-TakeOrdered, never a global sort of
    // the key table.
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(
        count(lit(1)).as("n_keys"),
        expr("percentile(cnt, 0.5D)").as("p50_rows"),
        expr("percentile(cnt, 0.99D)").as("p99_rows"),
        sum("cnt").as("total"))
      counts.crossJoin(broadcast(stats))
        .select(col("user_id"), col("cnt"),
          round(col("cnt").cast("double") / col("total"), 4).as("share"),
          col("n_keys"), col("p50_rows"), col("p99_rows"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |             quantile_cont(cnt, 0.5) AS p50_rows,
      |             quantile_cont(cnt, 0.99) AS p99_rows,
      |             sum(cnt) AS total FROM c)
      |SELECT user_id, cnt, round(CAST(cnt AS DOUBLE) / total, 4) AS share,
      |       n_keys, p50_rows, p99_rows
      |FROM c CROSS JOIN s ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin))

  private val b38 = Q(
    "b38_funnel",
    // Earliest-anchor funnel (stricter than ClickHouse windowFunnel — see
    // b40 for CH re-anchoring parity): how far down view→click→purchase
    // does each user get within 24 h of their FIRST view? One shuffle into
    // a k-bounded aggregate (skew-safe: per-user state capped, non-step
    // events absorbed map-side); oracle states the cascading-min
    // definition, which the greedy fold provably equals.
    (s, dir) => operators.Funnel.windowFunnel(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 86400000000L)
      .groupBy("level").agg(count(lit(1)).as("n_users")),
    Some("""WITH t1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
      |    AND epoch_us(e.ts) <= t1.t1 + 86400000000 GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |  FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
      |    AND epoch_us(e.ts) <= t1.t1 + 86400000000 GROUP BY 1),
      |lv AS (
      |  SELECT u.user_id,
      |    CASE WHEN t3.user_id IS NOT NULL THEN 3
      |         WHEN t2.user_id IS NOT NULL THEN 2
      |         WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
      |  FROM (SELECT DISTINCT user_id FROM events) u
      |  LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |  LEFT JOIN t3 USING (user_id))
      |SELECT CAST(level AS INT) AS level, count(*) AS n_users
      |FROM lv GROUP BY level""".stripMargin))

  private val b40 = Q(
    "b40_funnel_reanchor",
    // ClickHouse windowFunnel default-mode PARITY (re-anchoring: every
    // later view restarts the 24 h window; level = best chain over any
    // anchor). Implemented as n−1 running-max window recurrences over one
    // user-partitioned sort — no per-user buffer, spills instead of OOMing
    // on bot users. Greedy = EXISTS-chain (monotone best anchor), so the
    // oracle can state it as joins: click strictly after view (equal-ts
    // click sorts before 'view', so strict), purchase at-or-after click
    // (equal-ts purchase sorts after 'click'), all within anchor+24 h.
    (s, dir) => operators.Funnel.windowFunnelReanchor(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 86400000000L)
      .groupBy("level").agg(count(lit(1)).as("n_users")),
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
      |l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      |l2 AS (
      |  SELECT DISTINCT v.user_id
      |  FROM events v JOIN events c ON v.user_id = c.user_id
      |  WHERE v.event_type = 'view' AND c.event_type = 'click'
      |    AND epoch_us(c.ts) > epoch_us(v.ts)
      |    AND epoch_us(c.ts) <= epoch_us(v.ts) + 86400000000),
      |l3 AS (
      |  SELECT DISTINCT v.user_id
      |  FROM events v
      |  JOIN events c ON v.user_id = c.user_id
      |  JOIN events p ON v.user_id = p.user_id
      |  WHERE v.event_type = 'view' AND c.event_type = 'click'
      |    AND p.event_type = 'purchase'
      |    AND epoch_us(c.ts) > epoch_us(v.ts)
      |    AND epoch_us(c.ts) <= epoch_us(v.ts) + 86400000000
      |    AND epoch_us(p.ts) >= epoch_us(c.ts)
      |    AND epoch_us(p.ts) <= epoch_us(v.ts) + 86400000000)
      |SELECT CAST(level AS INT) AS level, count(*) AS n_users FROM (
      |  SELECT u.user_id,
      |    CASE WHEN l3.user_id IS NOT NULL THEN 3
      |         WHEN l2.user_id IS NOT NULL THEN 2
      |         WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
      |  FROM u LEFT JOIN l1 ON u.user_id = l1.user_id
      |         LEFT JOIN l2 ON u.user_id = l2.user_id
      |         LEFT JOIN l3 ON u.user_id = l3.user_id)
      |GROUP BY level""".stripMargin))

  private val b41 = Q(
    "b41_asof_price",
    // the SURVEY §2 as-of PRICE query (a13 proves the operator on http
    // logs; this one is the classic orders-to-price-dimension shape): a
    // synthetic price-change dimension — 3 epochs per part, price stepping
    // +4% per epoch — as-of joined to every lineitem at its ship date
    // (STRICTLY prior change wins; ships before the first change price as
    // null and are counted, exercising the null path). One union + one
    // per-key ordered window — the same single-shuffle cost class a native
    // as-of join needs. Oracle states it as a correlated latest-prior
    // lookup, which DuckDB decorrelates.
    (s, dir) => {
      val changes = Tables.part(s, dir)
        .select(col("p_partkey").as("partkey"),
          explode(array(lit(0), lit(1), lit(2))).as("k"),
          col("p_retailprice"))
        .select(col("partkey"),
          date_add(lit("1993-01-01").cast("date"), col("k") * 730).as("ts"),
          // 0.04 step, not 0.05: cents·104 mod 100 is never 50, so the
          // rounded price has no half-cent ties where Spark's and DuckDB's
          // double rounding could disagree
          round(col("p_retailprice") * (lit(1) + lit(0.04) * col("k")), 2)
            .as("price"))
      val left = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("partkey"), col("l_shipdate").as("ts"),
          col("l_quantity"))
      operators.AsOf.joinPrior(left, changes, Seq("partkey"), "ts", Seq("price"))
        .groupBy(year(col("ts")).as("ship_year"))
        .agg(round(sum(col("asof_price") * col("l_quantity")), 2)
            .as("asof_revenue"),
          (count(lit(1)) - count(col("asof_price"))).as("pre_change_rows"))
    },
    Some("""WITH ks AS (SELECT unnest([0, 1, 2]) AS k),
      |changes AS (
      |  SELECT p_partkey AS partkey,
      |         DATE '1993-01-01' + INTERVAL (k * 730) DAY AS ts,
      |         round(p_retailprice * (1 + 0.04 * k), 2) AS price
      |  FROM part CROSS JOIN ks),
      |enriched AS (
      |  SELECT l.l_shipdate, l.l_quantity,
      |         (SELECT c.price FROM changes c
      |          WHERE c.partkey = l.l_partkey AND c.ts < l.l_shipdate
      |          ORDER BY c.ts DESC LIMIT 1) AS asof_price
      |  FROM lineitem l)
      |SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
      |       round(sum(asof_price * l_quantity), 2) AS asof_revenue,
      |       count(*) - count(asof_price) AS pre_change_rows
      |FROM enriched GROUP BY 1""".stripMargin))

  private val b42 = Q(
    "b42_ohlc",
    // ClickHouse's argMin/argMax signature functions in their classic
    // OHLC-candlestick shape: per (resource, hour) the FIRST and LAST
    // bytes_sent by event time plus high/low/volume — one shuffle, all
    // five aggregates in one HashAggregate; first/last ride a packed
    // numeric (ms, unique log_id) key through min_by/max_by, so ties are
    // deterministic and both engines order identically.
    (s, dir) => httpLog(s, dir)
      .withColumn("hr", date_trunc("hour", col("ts")))
      // packed numeric ordering key: (relative ms) · 2^26 + log_id — a
      // primitive-long key keeps min_by/max_by inside a HashAggregate
      // (string/struct keys demote the whole aggregate to a per-partition
      // SortAggregate, a map-side fact sort at 100 TB). Bounds: relative ms
      // in [0, 2^37) (ts between 2023-11 and ~2028-02), log_id in
      // [0, 2^26) (67M). BOTH engines fail loudly on a violated bound:
      // DuckDB through its checked INT64 multiply, Spark through the
      // raise_error guard below — without it Spark would silently
      // misorder the open/close picks (e.g. a ScaleProbe id inflation
      // crossing 2^26).
      .withColumn("_rel_ms", unix_millis(col("ts")) - lit(1700000000000L))
      .withColumn("tk",
        when(col("_rel_ms") < 0 || col("_rel_ms") >= lit(1L << 37)
            || col("log_id") < 0 || col("log_id") >= lit(1L << 26),
          raise_error(format_string(
            "b42 packed key out of bounds: rel_ms=%d log_id=%d " +
              "(need 0<=rel_ms<2^37, 0<=log_id<2^26)",
            col("_rel_ms"), col("log_id"))).cast("long"))
          .otherwise(col("_rel_ms") * lit(1L << 26) + col("log_id")))
      .drop("_rel_ms")
      .groupBy(col("resource_id"), col("hr"))
      .agg(
        min_by(col("bytes_sent"), col("tk")).as("open"),
        max_by(col("bytes_sent"), col("tk")).as("close"),
        max(col("bytes_sent")).as("high"),
        min(col("bytes_sent")).as("low"),
        count(lit(1)).as("volume")),
    Some(s"""${HttpLog.cte}
      |SELECT resource_id, date_trunc('hour', ts) AS hr,
      |       arg_min(bytes_sent, (epoch_ms(ts) - 1700000000000) * 67108864 + log_id) AS open,
      |       arg_max(bytes_sent, (epoch_ms(ts) - 1700000000000) * 67108864 + log_id) AS close,
      |       max(bytes_sent) AS high,
      |       min(bytes_sent) AS low,
      |       count(*) AS volume
      |FROM http_log
      |GROUP BY 1, 2""".stripMargin))

  private val b39 = Q(
    "b39_retention",
    // weekly cohort retention (the other signature dashboard matrix): users
    // cohorted by first-active week, the (cohort, week-offset) cell = how
    // many came back. distinct (user, week) → per-user min → same-key join
    // (no extra shuffle: both sides partitioned by user) → one matrix agg;
    // cohort sizes re-join broadcast-small.
    (s, dir) => {
      val weeks = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val firsts = weeks.groupBy("user_id").agg(min("wk").as("cohort"))
      val cells = weeks.join(firsts, "user_id")
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort")) / 7).cast("int"))
        .groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("active_users"))
      val sizes = cells.filter(col("week_offset") === 0)
        .select(col("cohort"), col("active_users").as("cohort_size"))
      cells.join(broadcast(sizes), "cohort")
        .select(col("cohort"), col("week_offset"), col("active_users"),
          round(col("active_users").cast("double") / col("cohort_size"), 4)
            .as("retention"))
    },
    Some("""WITH weeks AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |firsts AS (SELECT user_id, min(wk) AS cohort FROM weeks GROUP BY 1),
      |cells AS (
      |  SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_offset,
      |         count(*) AS active_users
      |  FROM weeks JOIN firsts USING (user_id) GROUP BY 1, 2),
      |sizes AS (SELECT cohort, active_users AS cohort_size FROM cells
      |          WHERE week_offset = 0)
      |SELECT CAST(cohort AS TIMESTAMP) AS cohort, week_offset, active_users,
      |       round(CAST(active_users AS DOUBLE) / cohort_size, 4) AS retention
      |FROM cells JOIN sizes USING (cohort)""".stripMargin))

  private val b43 = Q(
    "b43_pagerank",
    // Integer-exact PageRank (damping 0.85, 3 iterations) over the
    // customer↔supplier order graph — the iterative-join shape GraphX/Pregel
    // users run, expressed as plain relational ops so Catalyst handles it:
    // each iteration is one shuffle of the edge list keyed by src joined to
    // the current rank vector, contributions aggregated on dst. Ranks live
    // in integer 1e-12 units with floor division everywhere, so every
    // iteration is exact BIGINT arithmetic — aggregation order cannot
    // perturb a single bit, which is what lets an ITERATED fixpoint be
    // hash-checked against a SQL unroll (the d11 k-means technique). At
    // scale: edges are the only large relation — persisted ONCE, with each
    // round's rank vector persist-materialize-truncated (operators/Graph
    // .scala documents the iteration discipline and the hand-back contract).
    (s, dir) => operators.Graph.pageRank(
      s, Tables.lineitem(s, dir), Tables.orders(s, dir)),
    Some("""WITH base AS (
      |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT cn AS src, sn AS dst FROM base
      |  UNION ALL
      |  SELECT sn AS src, cn AS dst FROM base),
      |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
      |i1 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000000000 // (SELECT n FROM nn)
      |              + (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |  GROUP BY e.dst),
      |i2 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000000000 // (SELECT n FROM nn)
      |              + (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN i1 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |  GROUP BY e.dst),
      |i3 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000000000 // (SELECT n FROM nn)
      |              + (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN i2 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |  GROUP BY e.dst)
      |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
      |       node // 2 AS key, r AS rank_e12
      |FROM i3""".stripMargin))

  private val b44 = Q(
    "b44_heavy_hitters",
    // SpaceSaving heavy hitters (sql.graft.HeavyHitters, the approx_top_k
    // OSS Spark lacks): k-bounded frequency estimation through ONE
    // ObjectHashAggregate — k entries cross the wire per partition where
    // the exact groupBy shuffles every distinct value. Estimates inside the
    // [true, true+err] band legitimately vary with partition layout (no
    // bounded-memory sketch is merge-order-deterministic), so this is
    // rows-only (always exactly k rows on this cardinality) — the c03/d02
    // pattern; b45 is the hash-checked known-answer companion and
    // HeavyHittersSpec pins the estimation contract against exact counts.
    (s, dir) => {
      val hh = Tables.events(s, dir)
        .agg(graft.functions.heavy_hitters(col("user_id"), 32).as("hh"))
      hh.select(explode(col("hh")).as("e"))
        .select(col("e.value").as("user_id"), col("e.est"), col("e.err"))
    },
    None)

  private val b45 = Q(
    "b45_heavy_hitters_top",
    // known-answer companion (the d05/e20 pattern): half of all events are
    // planted onto one value (-1), so its estimate's LOWER bound (≥ true =
    // n/2) exceeds any other value's UPPER bound (true + n/k with per-user
    // true ≪ n/4) — the rank-1 IDENTITY is invariant to merge order even
    // though the estimate is not, and the sketch is provably full (k=8 <
    // distinct users). The oracle computes the same top value exactly.
    (s, dir) => {
      val v = when(col("event_id") % 2 === 0, lit(-1L)).otherwise(col("user_id"))
      Tables.events(s, dir)
        .agg(graft.functions.heavy_hitters(v, 8).as("hh"))
        .select(
          element_at(col("hh"), 1).getField("value").as("top_value"),
          size(col("hh")).cast("int").as("n_tracked"))
    },
    Some("""WITH vals AS (
      |  SELECT CASE WHEN event_id % 2 = 0 THEN -1 ELSE user_id END AS v
      |  FROM events),
      |top AS (
      |  SELECT v FROM vals GROUP BY v ORDER BY count(*) DESC, v LIMIT 1)
      |SELECT v AS top_value, CAST(8 AS INT) AS n_tracked FROM top""".stripMargin))

  private val b46 = Q(
    "b46_heavy_hitters_grouped",
    // The reference README's dashboard shape — "top talkers PER resource/
    // status" — b44's global sketch composed with a real GROUP BY: one
    // ObjectHashAggregate whose per-group state is the O(k) SpaceSaving
    // buffer (k entries per group per partition cross the wire; the exact
    // per-group groupBy(user).count.rank alternative shuffles every
    // (group, user) pair). Estimates inside [true, true+err] vary with
    // partition layout → rows-only (always |groups|·k rows at this
    // cardinality: every event_type has ≥k distinct users); b47 is the
    // hash-checked per-group known-answer companion, and HeavyHittersSpec
    // pins the grouped contract at 1 and 16 partitions per group.
    (s, dir) => Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.heavy_hitters(col("user_id"), 16).as("hh"))
      .select(col("event_type"), explode(col("hh")).as("e"))
      .select(col("event_type"), col("e.value").as("user_id"),
        col("e.est"), col("e.err")),
    None)

  private val b47 = Q(
    "b47_heavy_hitters_grouped_top",
    // b45's separation discipline applied PER GROUP: within each
    // event_type, half the events are planted onto a group-specific value
    // (-(length·1000 + ascii(first char)) — distinct per group, exactly
    // mirrorable in SQL), so in every group the planted value's lower
    // bound (≥ n_g/2) exceeds any real user's upper bound (true ≈ n_g/|users|
    // plus the MERGED presence/err bound 2·n_g/k = n_g/4 at k=8) — the
    // per-group rank-1 IDENTITY is merge-order-invariant even though the
    // estimates are not.
    (s, dir) => {
      val planted = when(col("event_id") % 2 === 0,
        -(length(col("event_type")).cast("long") * 1000 +
          ascii(col("event_type")).cast("long")))
        .otherwise(col("user_id"))
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(graft.functions.heavy_hitters(planted, 8).as("hh"))
        .select(col("event_type"),
          element_at(col("hh"), 1).getField("value").as("top_value"),
          size(col("hh")).cast("int").as("n_tracked"))
    },
    Some(hhPlantedTopOracle))

  private val profileCols = Seq(
    ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
    ("o_totalprice", "num"), ("o_orderdate", "ts"), ("o_orderpriority", "str"))

  private val b48 = Q(
    "b48_table_profile",
    // Single-scan table profiling (operators/Profile.scala) — the "what is
    // in this table" ops pass, 100 TB-shaped: per column, row/null counts,
    // KMV distinct estimate, canonical min/max — ALL as partial-aggregating
    // expressions in ONE ungrouped aggregate over ONE scan (map-side
    // combine, a one-row shuffle), then unpivoted to a row per column with
    // an explode projection. Hash-checkable because every value first maps
    // to a canonical integer/string repr (doubles → e4 fixed point,
    // timestamps → epoch micros) before any min/max or md5, and the
    // distinct estimate is the set-deterministic b23 KMV sketch — so even
    // the "approximate" column mirrors exactly in SQL.
    (s, dir) => operators.Profile.profile(Tables.orders(s, dir), profileCols),
    Some("WITH " + profileSqlBlocks("orders", "x").mkString(",\n") + "\n" +
      profileUnion("x")))

  /** The b48 profile replayed in SQL over source `src`, CTE names prefixed
    * with `tag` so two profiles compose in one statement (b49 drift).
    */
  private def profileSqlBlocks(src: String, tag: String,
                               cols: Seq[(String, String)] = profileCols): Seq[String] = {
    def repr(c: String, kind: String): String = kind match {
      case "int" => s"CAST($c AS BIGINT)"
      case "num" => s"CAST(floor($c * 10000) AS BIGINT)"
      case "ts"  => s"epoch_us($c)"
      case _     => "CAST(NULL AS BIGINT)"
    }
    def hashSql(c: String, kind: String): String =
      if (kind == "str") s"md5($c)" else s"md5(CAST(${repr(c, kind)} AS VARCHAR))"
    cols.map { case (c, kind) =>
      val (minN, maxN) =
        if (kind == "str") ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
        else (s"(SELECT min(${repr(c, kind)}) FROM $src)",
              s"(SELECT max(${repr(c, kind)}) FROM $src)")
      val (minS, maxS) =
        if (kind == "str") (s"(SELECT min($c) FROM $src)", s"(SELECT max($c) FROM $src)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""dh_${tag}_$c AS (SELECT DISTINCT ${hashSql(c, kind)} AS h FROM $src WHERE $c IS NOT NULL),
         |k_${tag}_$c AS (SELECT count(*) AS nd,
         |         (SELECT h FROM dh_${tag}_$c ORDER BY h LIMIT 1 OFFSET 63) AS kth_hash
         |         FROM dh_${tag}_$c),
         |p_${tag}_$c AS (SELECT '$c' AS "column", '$kind' AS kind,
         |  (SELECT count(*) FROM $src) AS n_rows,
         |  (SELECT count(*) - count($c) FROM $src) AS n_nulls,
         |  CAST(CASE WHEN nd < 64 THEN nd
         |       ELSE floor(63.0 / (CAST(greatest(${kmvDigitSum}, 1) AS DOUBLE)
         |                          / 4503599627370496.0)) END AS BIGINT) AS n_distinct_est,
         |  $minN AS min_num, $maxN AS max_num,
         |  $minS AS min_str, $maxS AS max_str
         |  FROM k_${tag}_$c)""".stripMargin
    }
  }

  private def profileUnion(tag: String,
                           cols: Seq[(String, String)] = profileCols): String =
    cols.map { case (c, _) => s"SELECT * FROM p_${tag}_$c" }
      .mkString("\nUNION ALL\n")

  private val b49 = Q(
    "b49_profile_drift",
    // Snapshot-over-snapshot drift report (Profile.drift) — what a
    // pipeline DOES with b48's profiles: today's ingest vs yesterday's,
    // one row per column, integer/boolean metrics only (ppm null-rate
    // delta, ppm distinct ratio, canonical-repr range escape) so the
    // report hash-checks end to end. Planted drift: "prev" drops every
    // 10th order AND caps o_totalprice < 400000, so cur shows a row-count
    // delta on every column, a distinct-ratio > 1e6 on the key columns,
    // and range_widened on o_totalprice (cur's max escapes the cap).
    // Cost shape: two single-scan profiles + a |columns|-row join.
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val prev = orders.filter(col("o_orderkey") % 10 =!= 0 &&
        col("o_totalprice") < 400000)
      operators.Profile.drift(
        operators.Profile.profile(orders, profileCols),
        operators.Profile.profile(prev, profileCols))
    },
    Some {
      val prevCte =
        """prev_orders AS (
          |  SELECT * FROM orders
          |  WHERE o_orderkey % 10 <> 0 AND o_totalprice < 400000)""".stripMargin
      "WITH " + (prevCte +: (profileSqlBlocks("orders", "c") ++
        profileSqlBlocks("prev_orders", "p"))).mkString(",\n") + "\n" +
        s""", profc AS (${profileUnion("c")}),
           |profp AS (${profileUnion("p")})
           |SELECT c."column", c.kind,
           |  c.n_rows AS n_rows_cur, p.n_rows AS n_rows_prev,
           |  CAST(floor(c.n_nulls * 1000000 / c.n_rows)
           |       - floor(p.n_nulls * 1000000 / p.n_rows) AS BIGINT) AS null_rate_delta_e6,
           |  CAST(floor(c.n_distinct_est * 1000000
           |             / greatest(p.n_distinct_est, 1)) AS BIGINT) AS distinct_ratio_e6,
           |  (coalesce(c.min_num < p.min_num, FALSE)
           |   OR coalesce(c.max_num > p.max_num, FALSE)
           |   OR coalesce(c.min_str < p.min_str, FALSE)
           |   OR coalesce(c.max_str > p.max_str, FALSE)) AS range_widened
           |FROM profc c JOIN profp p ON c."column" = p."column"""".stripMargin
    })

  private val b50 = Q(
    "b50_bucketed_colocated_join",
    // Bucketed fact⋈fact join as a gated row (r9 verdict task #5, the last
    // unregistered query-capability claim): both tables written bucketed+
    // sorted by the join key (operators/Bucketing.scala — the batch analog
    // of the reference's pre-partitioned ClickHouse sort key), then joined
    // AND aggregated on the bucket key with a ZERO-Exchange plan asserted
    // inside the gate. At 100 TB the two shuffles this deletes ARE the
    // join's cost; the bucket-key groupBy downstream rides the same
    // partitioning for free (HashPartitioning(okey) satisfies the
    // (okey, priority) clustering). The hash certifies the bucketed path
    // computes exactly what the shuffled path would.
    (s, dir) => {
      val base = operators.Scratch.dir("b50")
      s.sql("DROP TABLE IF EXISTS b50_lineitem")
      s.sql("DROP TABLE IF EXISTS b50_orders")
      operators.Bucketing.writeBucketed(s,
        Tables.lineitem(s, dir).select(col("l_orderkey").as("okey"),
          col("l_extendedprice"), col("l_discount")),
        "b50_lineitem", base + "/lineitem", Seq("okey"), buckets = 8)
      operators.Bucketing.writeBucketed(s,
        Tables.orders(s, dir).select(col("o_orderkey").as("okey"),
          col("o_orderpriority")),
        "b50_orders", base + "/orders", Seq("okey"), buckets = 8)
      // revenue in exact integer cents: the per-line product is ONE IEEE
      // multiply chain identical in both engines, rounded once; the SUM is
      // then order-free BIGINT — bucket-file read order vs the oracle's
      // row order flipped low-bit cents under a double sum (measured: 4 of
      // 1473 groups at sf0.001)
      val lineCents = expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
      def joinAgg() = operators.Bucketing
        .colocatedJoin(s, "b50_lineitem", "b50_orders", Seq("okey"))
        .groupBy(col("okey"), col("o_orderpriority"))
        .agg(sum(lineCents).as("revenue_cents"))
      val joined = joinAgg()
      import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeLike}
      val shuffles = physicalNodes(joined.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeLike => e }
      require(shuffles.isEmpty,
        s"bucketed join+agg must be shuffle-free, found ${shuffles.length}:\n" +
          joined.queryExecution.executedPlan)
      // ...and in the 100 TB regime, where a fact side never broadcasts
      // (at the test SF Catalyst correctly prefers a broadcast join for
      // the tiny orders side), the CO-LOCATED shape must carry the whole
      // plan: with broadcast priced out, zero exchanges of ANY kind —
      // the buckets are the partitions on both sides, and the bucket-key
      // aggregate rides the same partitioning. Plan-only check; the
      // returned frame keeps the cost-based plan.
      val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val strictPlan = try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joinAgg().queryExecution.executedPlan
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      val exchanges = physicalNodes(strictPlan).collect { case e: Exchange => e }
      require(exchanges.isEmpty,
        s"co-located plan must be exchange-free with broadcast off:\n$strictPlan")
      joined
    },
    Some("""SELECT l_orderkey AS okey, o_orderpriority,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                     AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2""".stripMargin))

  private val b51 = Q(
    "b51_kmv_xxhash64",
    // The PRODUCTION sketch configuration as a registered row (r9 verdict
    // task #2): the same KmvDistinct/HashSample aggregates every md5-gated
    // sketch row certifies, fed xxhash64 LONGS — no per-row hex
    // materialization, no parse, the path a 100 TB run should use (b48's
    // probe showed md5 hashing itself is the dominant per-row profile
    // cost). DuckDB has no xxhash64, so this row is rows-only by design —
    // b52 is the hash-checked known-answer companion (the b44/b45
    // pattern), and KmvSpec pins the xxhash64 merge law + a brute-force
    // known answer for both aggregates.
    (s, dir) => {
      val hl = httpLog(s, dir)
      hl.groupBy(col("cache_status"))
        .agg(
          // log_id is the one high-cardinality column (unique per row), so
          // the estimator genuinely runs — every other http_log column
          // derives from the small user domain and would sit in the
          // sub-k exact regime
          operators.Kmv.kmv_distinct(64)(xxhash64(col("log_id"))).as("k"),
          operators.Kmv.hash_sample(4)(
            xxhash64(col("remote_addr")), col("log_id")).as("smp"))
        .select(col("cache_status"),
          col("k.est_distinct").as("est_distinct_logs"),
          posexplode(col("smp")).as(Seq("pos", "e")))
        .select(col("cache_status"), col("est_distinct_logs"),
          (col("pos") + 1).cast("int").as("sample_rank"),
          col("e.h").as("sample_hash"), col("e.payload").as("sample_log_id"))
    },
    None)

  private val b52 = Q(
    "b52_kmv_xxhash64_known",
    // b51's hash-checked companion. Two planted regimes:
    //  - `sub_k`: 32 distinct values < k=64 ⇒ the sketch is provably in
    //    its EXACT regime — est_distinct must equal the true distinct
    //    count regardless of which hash fed it. A corrupted long-input
    //    path (mis-ordered insertions, dropped values) breaks the
    //    equality and reddens the hash.
    //  - `super_k`: |log_ids| = |rows| ≫ k=256 ⇒ the estimator runs for
    //    real; the
    //    emitted band check (±40% ≈ 6σ at k=256, se = 1/√254 ≈ 6.3%) is
    //    computed IN Spark against the exact count the oracle verifies —
    //    order-statistic corruption throws the estimate far outside the
    //    band and flips the boolean.
    // Every emitted column is engine-mirrorable: exact counts, the
    // sub-k estimate (= exact), and the band booleans.
    (s, dir) => {
      val hl = httpLog(s, dir)
      val sub = hl.agg(
          operators.Kmv.kmv_distinct(64)(
            xxhash64(pmod(col("resource_id"), lit(32)))).as("k"),
          countDistinct(pmod(col("resource_id"), lit(32))).as("exact"))
        .select(lit("sub_k").as("bucket"),
          col("exact").as("exact_distinct"),
          col("k.est_distinct").as("est_if_exact"),
          (col("k.est_distinct") === col("exact")).as("est_in_band"))
      val sup = hl.agg(
          operators.Kmv.kmv_distinct(256)(xxhash64(col("log_id"))).as("k"),
          countDistinct(col("log_id")).as("exact"))
        .select(lit("super_k").as("bucket"),
          col("exact").as("exact_distinct"),
          lit(null).cast("long").as("est_if_exact"),
          (col("k.est_distinct") >= col("exact") * 0.6 &&
           col("k.est_distinct") <= col("exact") * 1.4).as("est_in_band"))
      sub.unionByName(sup)
    },
    Some(s"""${HttpLog.cte}
      |SELECT 'sub_k' AS bucket,
      |       count(DISTINCT resource_id % 32) AS exact_distinct,
      |       count(DISTINCT resource_id % 32) AS est_if_exact,
      |       TRUE AS est_in_band
      |FROM http_log
      |UNION ALL
      |SELECT 'super_k', count(DISTINCT log_id), CAST(NULL AS BIGINT), TRUE
      |FROM http_log""".stripMargin))

  private val b53 = Q(
    "b53_profile_xxhash64",
    // The PRODUCTION profile composition certified (closing the b51/b52
    // loop at the operator level): Profile.profile with hashKind = "xx" —
    // xxhash64 longs straight into the sketch's long-input path, the
    // configuration the §6 probe measured 2.1–3.1× faster than the
    // oracle-replayable md5. Everything except the estimate mirrors
    // EXACTLY (counts, null accounting, canonical min/max reprs); the
    // estimate is checked b52-style against the oracle-verified exact
    // distinct count — EQUALITY in the provably-exact sub-k regime
    // (cache_status: 3 distinct; resource_id: ≤ 50 < k=64; remote_addr
    // at sf0.001: 15), a ±40% band (≈3σ at k=64) where the estimator
    // runs for real (bytes_sent: thousands of distinct values;
    // remote_addr at sf0.01: 150). A corrupted long-input path flips a
    // boolean or the sub-k equality and reddens the hash.
    (s, dir) => {
      val hl = httpLog(s, dir)
      val p = operators.Profile.profile(hl, streamProfileCols, hashKind = "xx")
      val ex = hl.agg(
          countDistinct(col("resource_id")).as("resource_id"),
          countDistinct(col("bytes_sent")).as("bytes_sent"),
          countDistinct(col("remote_addr")).as("remote_addr"),
          countDistinct(col("cache_status")).as("cache_status"))
        .select(explode(map(
          lit("resource_id"), col("resource_id"),
          lit("bytes_sent"), col("bytes_sent"),
          lit("remote_addr"), col("remote_addr"),
          lit("cache_status"), col("cache_status")))
          .as(Seq("column", "exact_distinct")))
      p.join(ex, "column").select(
        col("column"), col("kind"), col("n_rows"), col("n_nulls"),
        col("exact_distinct"),
        when(col("exact_distinct") < 64,
          col("n_distinct_est") === col("exact_distinct"))
          .otherwise(col("n_distinct_est") >= col("exact_distinct") * 0.6 &&
                     col("n_distinct_est") <= col("exact_distinct") * 1.4)
          .as("est_ok"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    },
    Some {
      def block(c: String, kind: String): String = {
        val (minN, maxN) =
          if (kind == "str") ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
          else (s"min(CAST($c AS BIGINT))", s"max(CAST($c AS BIGINT))")
        val (minS, maxS) =
          if (kind == "str") (s"min($c)", s"max($c)")
          else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        s"""SELECT '$c' AS "column", '$kind' AS kind, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS exact_distinct, TRUE AS est_ok,
           |  $minN AS min_num, $maxN AS max_num,
           |  $minS AS min_str, $maxS AS max_str
           |FROM http_log""".stripMargin
      }
      s"""${HttpLog.cte}
         |${Seq(("resource_id", "int"), ("bytes_sent", "int"),
                ("remote_addr", "str"), ("cache_status", "str"))
               .map { case (c, k) => block(c, k) }.mkString("\nUNION ALL\n")}""".stripMargin
    })

  private val b54 = Q(
    "b54_bloom_filter_join",
    // The runtime bloom-filter join registered (r10 verdict task #3 —
    // the one §4 scale claim whose enforcement was spec-only): a
    // selective dim predicate is turned by Spark's InjectRuntimeFilter
    // into a bloom `might_contain` applied to the FACT side BEFORE its
    // shuffle write, so non-matching fact rows never cross the wire —
    // at 100 TB that pre-shuffle prune IS the join's cost. The bloom
    // gates (10 GB application-side scan threshold) are sized for real
    // clusters and unreachable at test SF, so the gate forces them
    // in-gate (b50's forced-regime pattern, confs restored before
    // return), asserts the `bloom_filter_might_contain` sits BELOW the
    // fact side's ShuffleExchange in the executed plan, materializes the
    // bloomed result under those confs (handed back persisted — the
    // documented Bm25/TextLm cache contract), and hash-checks it against
    // the plain-join oracle: a false-negative bloom (dropped rows) or a
    // mis-scoped filter reddens the hash.
    (s, dir) => {
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // fact never broadcasts at scale
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
      val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        val lineCents = expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
        val out = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n_items"), sum(lineCents).as("revenue_cents"))
        val factShuffles = physicalNodes(out.queryExecution.executedPlan)
          .collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
                if e.toString.contains("lineitem") => e
          }
        require(factShuffles.nonEmpty &&
          factShuffles.exists(_.toString.toLowerCase.contains("bloom")),
          "bloom filter must prune the fact side BEFORE its exchange, plan:\n" +
            out.queryExecution.executedPlan)
        out.persist()
        out.count() // materialize under the forced-bloom confs
        out
      } finally {
        confs.foreach { case (k, _) => s.conf.unset(k) }
        saved.foreach { case (k, v) => v.foreach(s.conf.set(k, _)) }
      }
    },
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
      |       count(*) AS n_items,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                     AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1""".stripMargin))

  // ---------------------------------------------------------------- group C

  /** documents + planted duplicates: doc_id%20==0 → exact copy at id+100000,
    * doc_id%20==10 → near copy (3 extra tokens). Gives the dedup family
    * known answers; the oracle CTE mirrors it exactly.
    */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text",
        when(col("doc_id") % 20 === 10, concat(col("text"), lit(" graft dup marker")))
          .otherwise(col("text")))
    docs.unionByName(planted)
  }

  private val corpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |         CASE WHEN doc_id % 20 = 10 THEN text || ' graft dup marker' ELSE text END AS text,
      |         lang, source, n_chars
      |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  private val c01 = Q(
    "c01_exact_dedup",
    (s, dir) => Dedup.exact(corpus(s, dir), "doc_id", "text"),
    Some(s"""WITH $corpusCte
      |SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |       count(*) AS n_copies
      |FROM corpus GROUP BY 1""".stripMargin),
    bench = true)

  /** Shared oracle CTE chain: distinct word-3-gram sets of normalized text
    * (c04's template), then pair intersection sizes via a gram equi-join —
    * the DuckDB mirror of what [[graft.functions.TextHash.wordShingles]]
    * hashes (collision-free at this cardinality, so counts match exactly).
    * Token-less docs are excluded on both sides (see ngramJaccardPairs).
    */
  private def gramCtes(src: String): String =
    s"""toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM $src
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |                        x -> x <> '')) > 0),
      |grams AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN list_transform(range(1, len(t) - 1),
      |                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |           ELSE t END) AS g
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
      |pair_inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gram
      |  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id)""".stripMargin

  private val c17 = Q(
    "c17_fuzzy_contamination",
    // FUZZY benchmark decontamination — the MinHash sibling of c08's exact
    // shared-gram check (modern pipelines screen eval sets with fuzzy
    // 13-gram/MinHash matching precisely because contaminated copies are
    // rarely verbatim): the planted-dup corpus LSH-screened against the
    // same every-17th-doc benchmark, flagging any corpus doc at gram
    // Jaccard ≥ 0.5 with a benchmark item. Bucketed band join + bounded
    // verify (the g03 screen machinery) — never an all-pairs cross; the
    // oracle is the exact cross Jaccard (LSH recall 1 at j ≥ 0.5 here,
    // c02's argument).
    (s, dir) => streaming.NearDupScreen.screen(
        corpus(s, dir),
        Tables.documents(s, dir).filter(col("doc_id") % 17 === 0),
        "doc_id", "text")
      .withColumnRenamed("corpus_id", "bench_id"),
    Some(s"""WITH $corpusCte,
      |${gramCtes("corpus")},
      |btoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM documents WHERE doc_id % 17 = 0
      |    AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |                        x -> x <> '')) > 0),
      |bgrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM btoks),
      |bex AS (SELECT doc_id AS bench_id, unnest(g) AS gram FROM bgrams),
      |inter AS (
      |  SELECT ex.doc_id, bench_id, count(*) AS i
      |  FROM ex JOIN bex USING (gram) GROUP BY 1, 2),
      |csz AS (SELECT doc_id, len(g) AS n FROM grams),
      |bsz AS (SELECT doc_id AS bench_id, len(g) AS n FROM bgrams)
      |SELECT doc_id, bench_id,
      |       round(CAST(i AS DOUBLE) / (csz.n + bsz.n - i), 4) AS jaccard
      |FROM inter JOIN csz USING (doc_id) JOIN bsz USING (bench_id)
      |WHERE CAST(i AS DOUBLE) / (csz.n + bsz.n - i) >= 0.5""".stripMargin))

  private val c02 = Q(
    "c02_minhash_lsh",
    (s, dir) => Dedup.minhashPairs(corpus(s, dir), "doc_id", "text"),
    // The banding itself is not SQL-expressible, but its OUTPUT is: on this
    // corpus every pair at Jaccard ≥ 0.5 is caught by at least one of the 32
    // bands (verified deterministic at sf0.001/0.01/0.1), so the verified
    // pair set equals the exact 3-gram-Jaccard threshold pairs.
    Some(s"""WITH $corpusCte,
      |${gramCtes("corpus")},
      |inter AS (
      |  SELECT id_a, id_b, count(*) AS i FROM pair_inter GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(g) AS n FROM grams)
      |SELECT id_a, id_b,
      |       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5""".stripMargin),
    bench = true)

  private val c03 = Q(
    "c03_simhash",
    // rows-only (simhash64 is a codegen'd xxhash64-based expression DuckDB
    // cannot replay); c13 hash-checks planted-pair detection, and c18
    // (new r8) hash-checks the ENTIRE simhash pipeline shape — votes,
    // signature, banding, hamming verify — under an md5 token hash both
    // engines share.
    (s, dir) => Dedup.simhashPairs(corpus(s, dir), "doc_id", "text"),
    None)

  private val c18 = Q(
    "c18_simhash_md5_replay",
    // Full-replay oracle twin of c03: the same SimHash near-dup shape —
    // per-token hash → ±tf bit votes → 60-bit signature → 4×15-bit band
    // equi-join → hamming ≤ 3 verify — but with the token hash taken from
    // md5 (first 15 hex chars as a 60-bit int), which BOTH engines compute
    // identically, so every stage is hash-checked end-to-end in DuckDB.
    // c03 stays the production path (simhash64 is one codegen'd expression
    // per doc; this twin's explicit 60-row bit explode is the SQL-mirrorable
    // formulation, priced for the gate SF only).
    (s, dir) => {
      val c = corpus(s, dir)
      val tf = c.select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("h",
          expr("cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint)"))
      val votes = tf.select(col("doc_id"), col("tf"), col("h"),
          explode(expr("sequence(0, 59)")).as("i"))
        .groupBy("doc_id", "i")
        .agg(sum(when(expr("(shiftright(h, i) & 1)") === 1, col("tf"))
          .otherwise(-col("tf"))).as("v"))
      val sig = votes.groupBy("doc_id")
        .agg(sum(when(col("v") > 0,
          expr("shiftleft(cast(1 as bigint), i)")).otherwise(0L)).as("s"))
      val bands = sig.select(col("doc_id"), col("s"),
          explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("bv", expr("shiftright(s, 15 * b) & 32767"))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          col("x.s").as("sa"), col("y.s").as("sb"))
        .distinct()
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    },
    Some(s"""WITH $corpusCte,
      |toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      |  FROM corpus),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf,
      |         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
      |  FROM toks WHERE length(term) > 0 GROUP BY doc_id, term),
      |votes AS (
      |  SELECT doc_id, i,
      |         sum(CASE WHEN (h >> i) & 1 = 1 THEN tf ELSE -tf END) AS v
      |  FROM tf CROSS JOIN (SELECT unnest(range(60)) AS i) bitix
      |  GROUP BY doc_id, i),
      |sig AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0 END) AS s
      |  FROM votes GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, s, b, (s >> (15 * b)) & 32767 AS bv
      |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) bx),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |         x.s AS sa, y.s AS sb
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
      |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin))

  private val c19 = Q(
    "c19_paragraph_dedup",
    // CCNet-style keep-first paragraph dedup over the planted corpus plus
    // three synthetic paragraph plants: a banner every document shares
    // (survives only in the globally first document), a per-document unique
    // closer (always survives), and an even-docs-only footer. The +100000
    // exact copies contribute nothing new — every paragraph of a copy first
    // occurred in its source doc, so copies keep only their unique closer.
    (s, dir) => Dedup.paragraphDedup(
      corpus(s, dir).withColumn("text", concat(
        col("text"),
        lit("\n\nshared cookie banner paragraph common to every document"),
        lit("\n\nunique closing paragraph "), col("doc_id"),
        when(col("doc_id") % 2 === 0,
          lit("\n\neven documents also share this footer paragraph"))
          .otherwise(lit("")))),
      "doc_id", "text"),
    Some(s"""WITH $corpusCte,
      |aug AS (
      |  SELECT doc_id,
      |         text || chr(10) || chr(10) ||
      |         'shared cookie banner paragraph common to every document' ||
      |         chr(10) || chr(10) || 'unique closing paragraph ' || doc_id ||
      |         CASE WHEN doc_id % 2 = 0
      |              THEN chr(10) || chr(10) ||
      |                   'even documents also share this footer paragraph'
      |              ELSE '' END AS text
      |  FROM corpus),
      |p0 AS (
      |  SELECT doc_id, pos - 1 AS pos, ps[pos] AS para
      |  FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS pos
      |        FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
      |              FROM aug))),
      |p AS (
      |  -- loud pack-bound mirror (Dedup.packedOrderKey): pos via error(),
      |  -- doc_id additionally via DuckDB's overflow-checked INT64 multiply
      |  SELECT doc_id, pos, para,
      |         CASE WHEN pos >= 16777216 OR pos < 0
      |                OR doc_id >= 549755813888 OR doc_id < 0
      |              THEN CAST(error('c19 packed order key out of bounds') AS BIGINT)
      |              ELSE doc_id * 16777216 + pos END AS pk
      |  FROM p0),
      |fst AS (SELECT para, min(pk) AS fk FROM p GROUP BY para)
      |SELECT p.doc_id,
      |       string_agg(p.para, chr(10) || chr(10) ORDER BY p.pos) AS clean_text,
      |       count(*) AS n_paras_kept
      |FROM p JOIN fst ON fst.para = p.para AND p.pk = fst.fk
      |GROUP BY p.doc_id""".stripMargin))

  private val c20 = Q(
    "c20_substring_dedup",
    // Exact substring dedup (Lee et al. 2022): the +100000 planted copies
    // are full duplicates, so every 8-token window in a copy repeats its
    // source → copies collapse to empty (near-copies to their 3 marker
    // tokens' neighborhood); the appended 12-token run repeats corpus-wide
    // and survives only in the globally first document. The oracle replays
    // the whole rule relationally — window grams, keep-first, position
    // cover, ordered reassembly — grouped on the gram STRING where the
    // engine groups on its xxhash64 (a collision would redden the hash).
    (s, dir) => Dedup.substringDedup(
      corpus(s, dir).withColumn("text",
        concat(col("text"),
          lit(" the quick brown fox jumps over the lazy dog ends shared run"))),
      "doc_id", "text"),
    Some(s"""WITH $corpusCte,
      |aug AS (SELECT doc_id,
      |  text || ' the quick brown fox jumps over the lazy dog ends shared run' AS text
      |  FROM corpus),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM aug),
      |g0 AS (SELECT doc_id, i AS pos, array_to_string(ts[i + 1 : i + 8], ' ') AS gram
      |      FROM (SELECT doc_id, ts, unnest(range(0, greatest(len(ts) - 7, 0))) AS i
      |            FROM toks)),
      |g AS (
      |  -- loud pack-bound mirror (Dedup.packedOrderKey): pos via error(),
      |  -- doc_id additionally via DuckDB's overflow-checked INT64 multiply
      |  SELECT doc_id, pos, gram,
      |         CASE WHEN pos >= 16777216 OR pos < 0
      |                OR doc_id >= 549755813888 OR doc_id < 0
      |              THEN CAST(error('c20 packed order key out of bounds') AS BIGINT)
      |              ELSE doc_id * 16777216 + pos END AS pk
      |  FROM g0),
      |fst AS (SELECT gram, min(pk) AS fk FROM g GROUP BY gram),
      |dup AS (SELECT doc_id, pos FROM g JOIN fst USING (gram)
      |        WHERE pk <> fk),
      |rm AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS rp FROM dup),
      |tk AS (SELECT doc_id, i AS pos, ts[i + 1] AS tok
      |       FROM (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM toks)),
      |kept AS (SELECT t.doc_id, t.pos, t.tok
      |         FROM tk t LEFT JOIN rm ON rm.doc_id = t.doc_id AND rm.rp = t.pos
      |         WHERE rm.doc_id IS NULL)
      |SELECT t0.doc_id,
      |       coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS clean_text,
      |       CAST(any_value(len(t0.ts)) - count(k.tok) AS INT) AS n_removed_tokens
      |FROM toks t0 LEFT JOIN kept k ON k.doc_id = t0.doc_id
      |GROUP BY t0.doc_id""".stripMargin))

  private val c13 = Q(
    "c13_simhash_planted_pairs",
    // The known-answer core of c03 (the d05 twin-rank pattern): identical
    // texts hash to identical simhashes, so every planted exact copy MUST
    // pair with its source at hamming 0 — a missing pair reddens the gate.
    // The full hamming-0 slice is deliberately NOT the query: simhash is a
    // tf-weighted vote over the unigram bag, and distinct bags can
    // legitimately tie every bit (6 such pairs exist at sf0.01, and one
    // NEAR-copy plant's 3 extra marker tokens flip no vote), which no SQL
    // mirror can reproduce — hence the restriction to the exact plants,
    // where hamming 0 is a hard guarantee.
    (s, dir) => Dedup.simhashPairs(corpus(s, dir), "doc_id", "text")
      .filter(col("hamming") === 0 && col("id_b") === col("id_a") + 100000 &&
        col("id_a") % 20 === 0),
    Some("""SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
      |       CAST(0 AS INT) AS hamming
      |FROM documents WHERE doc_id % 20 = 0""".stripMargin))

  private val c14 = Q(
    "c14_exact_dedup_keep_best",
    // c01 with the RefinedWeb-style keeper policy: among exact copies keep
    // the highest-quality one (e02's score; id DESC tie-break = newest
    // crawl wins). One shuffle via keep_latest (ObjectHashAggregate) with
    // the (score, id) order packed into a long — max(struct) would demote
    // to SortAggregate on both sides (struct agg buffers aren't hash-able).
    (s, dir) => {
      val chars = length(col("text"))
      val toks = size(split(trim(col("text")), "\\s+"))
      val punct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
      val stops = size(expr(
        "regexp_extract_all(text, '\\\\b(the|a|and|of|to|in|is|it|for|on)\\\\b', 0)"))
      val quality = round(
        least(toks.cast("double") / 100.0, lit(1.0)) * 0.3 +
          (lit(1.0) - punct.cast("double") / chars) * 0.3 +
          least(stops.cast("double") / toks * 4.0, lit(1.0)) * 0.4, 4)
      Dedup.exactKeepBest(
        corpus(s, dir).withColumn("q", quality), "doc_id", "text", "q")
    },
    Some(s"""WITH $corpusCte,
      |q AS (
      |  SELECT doc_id, text,
      |    round(
      |      least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
      |      (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text)) * 0.3 +
      |      least(CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in|is|it|for|on)\\b')) AS DOUBLE)
      |            / len(regexp_split_to_array(trim(text), '\\s+')) * 4.0, 1.0) * 0.4, 4) AS q
      |  FROM corpus),
      |r AS (
      |  SELECT md5(text) AS fp, doc_id, q,
      |         row_number() OVER (PARTITION BY md5(text)
      |                            ORDER BY q DESC, doc_id DESC) AS rn,
      |         count(*) OVER (PARTITION BY md5(text)) AS n
      |  FROM q)
      |SELECT fp, doc_id AS keeper_id, q AS keeper_score,
      |       CAST(n AS BIGINT) AS n_copies
      |FROM r WHERE rn = 1""".stripMargin))

  private val c15 = Q(
    "c15_source_overlap",
    // Corpus-composition analytics: pairwise overlap between data SOURCES
    // (exact distinct-gram Jaccard + containment, zero-overlap pairs
    // included) — the "is this new crawl already in the mix?" question,
    // asked at the feed level. Spark counts 64-bit-hashed grams, the oracle
    // counts the same grams as strings (collision-free at this
    // cardinality); the MinHash-union sketch path for 100 TB corpora is
    // operators.Overlap.sourceSignatures, spec-proven in OverlapSpec.
    (s, dir) => Overlap.sourceOverlap(Tables.documents(s, dir), "source", "text"),
    Some("""WITH toks AS (
      |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                        x -> x <> '')) > 0),
      |sg AS (
      |  SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS gram
      |  FROM toks),
      |sizes AS (SELECT source, count(*) AS sz FROM sg GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      |  FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT x.source AS src_a, y.source AS src_b,
      |  x.sz AS grams_a, y.sz AS grams_b,
      |  CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
      |  round(coalesce(i.inter, 0) / (x.sz + y.sz - coalesce(i.inter, 0)), 4) AS jaccard,
      |  round(coalesce(i.inter, 0) / least(x.sz, y.sz), 4) AS containment
      |FROM sizes x JOIN sizes y ON x.source < y.source
      |LEFT JOIN inter i ON i.src_a = x.source AND i.src_b = y.source""".stripMargin))

  private val c16 = Q(
    "c16_snapshot_diff",
    // incremental-crawl diff: a synthetic "next snapshot" removes every
    // 13th doc, rewrites every 11th, adds a batch of new ids — and the diff
    // must classify every id exactly (added/removed/changed/same), counted
    // per status. The join carries (id, fingerprint), never text.
    (s, dir) => {
      val base = Tables.documents(s, dir)
      val next = base
        .filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 300000))
      Dedup.snapshotDiff(base, next, "doc_id", "text")
        .groupBy("status").agg(count(lit(1)).as("n_docs"))
    },
    Some("""WITH next AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
      |d AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |         CASE WHEN o.doc_id IS NULL THEN 'added'
      |              WHEN n.doc_id IS NULL THEN 'removed'
      |              WHEN md5(o.text) <> md5(n.text) THEN 'changed'
      |              ELSE 'same' END AS status
      |  FROM documents o FULL OUTER JOIN next n ON o.doc_id = n.doc_id)
      |SELECT status, count(*) AS n_docs FROM d GROUP BY status""".stripMargin))

  private val c04 = Q(
    "c04_ngram_jaccard",
    (s, dir) => Dedup.ngramJaccardPairs(corpus(s, dir), "doc_id", "text", "source"),
    // Spark computes Jaccard over 64-bit-hashed distinct word 3-grams of the
    // normalized (lowercase, whitespace-collapsed) text; the oracle builds
    // the same 3-gram sets as strings (hashing is collision-free at this
    // cardinality), so values must match exactly.
    Some(s"""WITH $corpusCte,
      |toks AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM corpus
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |                        x -> x <> '')) > 0),
      |grams AS (
      |  SELECT doc_id, source,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN list_transform(range(1, len(t) - 1),
      |                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |           ELSE t END) AS g
      |  FROM toks),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |           / len(list_distinct(list_concat(a.g, b.g))) AS j
      |  FROM grams a JOIN grams b ON a.source = b.source AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(j, 4) AS jaccard
      |FROM pairs WHERE j >= 0.6""".stripMargin))

  private val c07 = Q(
    "c07_weighted_minhash",
    (s, dir) => Dedup.weightedMinhashPairs(corpus(s, dir), "doc_id", "text"),
    // Same planted-pair argument as c02's oracle, with the idf weights
    // reproduced exactly: integer weights and integer weight sums are
    // engine-exact, so the final double division matches bit-for-bit.
    Some(s"""WITH $corpusCte,
      |${gramCtes("corpus")},
      |nd AS (SELECT count(*) AS n_docs FROM corpus),
      |wt AS (
      |  SELECT gram,
      |         greatest(1, least(8,
      |           CAST(ceil(ln(CAST(n_docs AS DOUBLE) / count(*))) AS BIGINT))) AS w
      |  FROM ex, nd GROUP BY gram, n_docs),
      |tot AS (
      |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw
      |  FROM ex JOIN wt USING (gram) GROUP BY doc_id),
      |inter AS (
      |  SELECT id_a, id_b, CAST(sum(w) AS BIGINT) AS iw
      |  FROM pair_inter JOIN wt USING (gram) GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |       round(CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw), 4) AS wjaccard
      |FROM inter
      |JOIN tot ta ON ta.doc_id = id_a
      |JOIN tot tb ON tb.doc_id = id_b
      |WHERE CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw) >= 0.5""".stripMargin),
    bench = true)

  private val c08 = Q(
    "c08_contamination",
    // benchmark decontamination: training corpus (with planted near-dups) vs
    // a deterministic "benchmark" subset (every 17th document). Planted
    // copies of doc_id % 170 == 0 docs surface as cross-document
    // contamination hits; every benchmark doc long enough also matches its
    // own corpus copy — both mirrored exactly by the oracle.
    (s, dir) => Dedup.contamination(
      corpus(s, dir),
      Tables.documents(s, dir).filter(col("doc_id") % 17 === 0),
      "doc_id", "text"),
    Some(s"""WITH $corpusCte,
      |${gramCtes("corpus")},
      |btoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM documents WHERE doc_id % 17 = 0
      |    AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |                        x -> x <> '')) > 0),
      |bgrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM btoks),
      |bex AS (SELECT doc_id AS bench_id, unnest(g) AS gram FROM bgrams),
      |hot AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) > 10000)
      |SELECT d.doc_id, bench_id, count(*) AS shared_grams
      |FROM ex d JOIN bex USING (gram)
      |WHERE gram NOT IN (SELECT gram FROM hot)
      |GROUP BY 1, 2
      |HAVING count(*) >= 5""".stripMargin))

  private val c09 = Q(
    "c09_neardup_clusters",
    // near-dup clusters: verified MinHash pairs → connected components
    // (alternating star contraction) → (doc, component-min rep, size). The
    // oracle recomputes the same components from the exact 3-gram-Jaccard
    // pair set (== the verified LSH output on this corpus, as c02 proves)
    // with a recursive min-label closure.
    (s, dir) => Dedup.nearDupClusters(corpus(s, dir), "doc_id", "text"),
    Some(s"""WITH RECURSIVE $corpusCte,
      |${gramCtes("corpus")},
      |inter AS (
      |  SELECT id_a, id_b, count(*) AS i FROM pair_inter GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(g) AS n FROM grams),
      |pj AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |nodes AS (SELECT id_a AS id FROM pj UNION SELECT id_b FROM pj),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pj
      |          UNION ALL SELECT id_b, id_a FROM pj),
      |reach(id, r) AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id),
      |cc AS (SELECT id AS doc_id, min(r) AS rep FROM reach GROUP BY id),
      |sz AS (SELECT rep, count(*) AS cluster_size FROM cc GROUP BY rep)
      |SELECT doc_id, cc.rep, cluster_size FROM cc JOIN sz USING (rep)""".stripMargin))

  private val c05 = Q(
    "c05_embedding_neardup",
    (s, dir) => Dedup.embeddingPairs(augEmbeddings(s, dir), "vec_id", "embedding"),
    Some("""WITH aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 25 = 0)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
      |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""".stripMargin))

  private val c06 = Q(
    "c06_clean_corpus",
    (s, dir) => Dedup.cleanCorpus(corpus(s, dir), "doc_id", "text"),
    // Whole-pipeline oracle: length floor → exact dedup (keep min id) →
    // drop the higher id of every exact-Jaccard ≥ 0.5 pair among keepers
    // (LSH recall is 1 on this corpus — same argument as c02's oracle).
    Some(s"""WITH $corpusCte,
      |longe AS (
      |  SELECT doc_id, text FROM corpus
      |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 5),
      |exd AS (
      |  SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |         count(*) AS exact_copies
      |  FROM longe GROUP BY 1),
      |kept AS (
      |  SELECT keeper_id AS doc_id, fp, exact_copies, text
      |  FROM exd JOIN longe ON doc_id = keeper_id),
      |${gramCtes("kept")},
      |inter AS (
      |  SELECT id_a, id_b, count(*) AS i FROM pair_inter GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(g) AS n FROM grams),
      |drops AS (
      |  SELECT DISTINCT id_b AS doc_id
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5)
      |SELECT doc_id, fp, exact_copies
      |FROM kept
      |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin),
    bench = true)

  private val c10 = Q(
    "c10_clean_corpus_cc",
    // c06 with transitive semantics: ONE representative per connected
    // near-dup cluster. Oracle = c06's keeper stage + c09's recursive
    // min-label closure over the keeper pair graph.
    (s, dir) => Dedup.cleanCorpusCC(corpus(s, dir), "doc_id", "text"),
    Some(s"""WITH RECURSIVE $corpusCte,
      |longe AS (
      |  SELECT doc_id, text FROM corpus
      |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 5),
      |exd AS (
      |  SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |         count(*) AS exact_copies
      |  FROM longe GROUP BY 1),
      |kept AS (
      |  SELECT keeper_id AS doc_id, fp, exact_copies, text
      |  FROM exd JOIN longe ON doc_id = keeper_id),
      |${gramCtes("kept")},
      |inter AS (
      |  SELECT id_a, id_b, count(*) AS i FROM pair_inter GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(g) AS n FROM grams),
      |pj AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |nodes AS (SELECT id_a AS id FROM pj UNION SELECT id_b FROM pj),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pj
      |          UNION ALL SELECT id_b, id_a FROM pj),
      |reach(id, r) AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id),
      |nonreps AS (
      |  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> min(r))
      |SELECT doc_id, fp, exact_copies
      |FROM kept
      |WHERE doc_id NOT IN (SELECT doc_id FROM nonreps)""".stripMargin))

  private val c11 = Q(
    "c11_line_dedup",
    // line-level boilerplate removal: every doc gains a shared footer line
    // (df = |docs| → dropped) and a unique tail line (kept); the original
    // single-line body is unique per doc and survives. Exact row-set oracle
    // via per-line document frequency + ordered reassembly.
    (s, dir) => Dedup.lineDedup(
      Tables.documents(s, dir).withColumn("text",
        concat(col("text"), lit("\nshared boilerplate footer line\nunique tail "),
          col("doc_id"))),
      "doc_id", "text"),
    Some("""WITH lc AS (
      |  SELECT doc_id,
      |         text || chr(10) || 'shared boilerplate footer line' ||
      |         chr(10) || 'unique tail ' || doc_id AS text
      |  FROM documents),
      |docs2 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lc),
      |exploded AS (
      |  SELECT doc_id, pos, ls[pos] AS line
      |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS pos FROM docs2)),
      |hot AS (
      |  SELECT line FROM exploded GROUP BY line
      |  HAVING count(DISTINCT doc_id) > 1)
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
      |FROM exploded e
      |WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.line = e.line)
      |GROUP BY doc_id""".stripMargin))

  private val c12 = Q(
    "c12_semdedup",
    // SemDeDup over the twin-planted embeddings: the only pairs anywhere at
    // cosine ≥ 0.9 are the exact planted twins (max non-twin cosine in the
    // synthetic corpus is ≈0.60 at sf0.1, measured), and identical vectors
    // always share a cell (same argmax), so the removed set is exactly the
    // twins regardless of k-means float jitter — which is what makes this
    // hash-oracle-able even though the clustering itself is not.
    (s, dir) => SemDedup.removed(augEmbeddings(s, dir), nCells = 16, tau = 0.9),
    Some("""SELECT CAST(vec_id + 100000 AS BIGINT) AS removed,
      |       vec_id AS kept
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin))

  // ---------------------------------------------------------------- group D

  private val d01 = Q(
    "d01_ann_bruteforce",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(emb, queries, 10)
    },
    // embeddings cast to DOUBLE[] so DuckDB accumulates in double like
    // VectorOps.cosine does (float accumulation flips ~1% of 4-dp roundings)
    Some("""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT qid, e.vec_id AS neighbor,
      |         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS c,
      |         row_number() OVER (PARTITION BY qid
      |           ORDER BY list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rank
      |  FROM q JOIN embeddings e ON e.vec_id <> q.qid)
      |SELECT qid, neighbor, round(c, 4) AS cos_sim, CAST(rank AS INT) AS rank
      |FROM scored WHERE rank <= 10""".stripMargin),
    bench = true)

  private val d02 = Q(
    "d02_ann_lsh",
    (s, dir) => {
      // query the planted twins: their exact copies must be retrieved
      // (hyperplane collision probability 1 at cosine 1) — asserted in spec
      val aug = augEmbeddings(s, dir)
      val queries = aug.filter(col("vec_id") >= 100000)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.lshTopK(aug, queries, 5, multiProbe = true)
    },
    None)

  private val d03 = Q(
    "d03_ann_ivf",
    (s, dir) => {
      val aug = augEmbeddings(s, dir)
      val queries = aug.filter(col("vec_id") >= 100000)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.ivfTopK(aug, queries, 5)
    },
    // Flipped from rows-only in r7: the d11 technique replays the ENTIRE
    // IVF pipeline in SQL — seed centroids, one Lloyd iteration (per-dim
    // double mean, FLOAT cast to kill summation-order ulps), argmax cell
    // assignment, per-query top-4 cell probe, candidate join, exact-cosine
    // top-5 — so the hash now certifies the coarse quantizer itself, not
    // just twin recall (d06 stays as the planted-recall companion).
    Some("""WITH aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
      |  FROM embeddings WHERE vec_id % 25 = 0),
      |c0 AS (SELECT vec_id AS cid, e AS cv FROM aug WHERE vec_id < 16),
      |r0 AS (SELECT a.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY a.vec_id
      |           ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM aug a CROSS JOIN c0 c),
      |a0 AS (SELECT vec_id, cid AS cell FROM r0 WHERE rn = 1),
      |m1 AS (SELECT a0.cell, s.i, CAST(CAST(avg(round(a.e[s.i] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS v
      |       FROM a0 JOIN aug a USING (vec_id), generate_series(1, 64) s(i)
      |       GROUP BY a0.cell, s.i),
      |c1 AS (SELECT cell AS cid, list(v ORDER BY i) AS cv FROM m1 GROUP BY cell),
      |asg AS (SELECT a.vec_id, c.cid AS cell, a.e,
      |          row_number() OVER (PARTITION BY a.vec_id
      |            ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |        FROM aug a CROSS JOIN c1 c),
      |assigned AS (SELECT vec_id, cell, e FROM asg WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, e AS qv FROM aug WHERE vec_id >= 100000),
      |pc AS (SELECT q.qid, q.qv, c.cid AS cell,
      |         row_number() OVER (PARTITION BY q.qid
      |           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid DESC) AS rn
      |       FROM q CROSS JOIN c1 c),
      |probes AS (SELECT qid, qv, cell FROM pc WHERE rn <= 4),
      |cand AS (
      |  SELECT p.qid, p.qv, s.vec_id, s.e
      |  FROM probes p JOIN assigned s USING (cell)
      |  WHERE s.vec_id <> p.qid),
      |ranked AS (
      |  SELECT qid, vec_id AS neighbor,
      |         list_cosine_similarity(e, qv) AS c,
      |         row_number() OVER (PARTITION BY qid
      |           ORDER BY list_cosine_similarity(e, qv) DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT qid, neighbor, round(c, 4) AS cos_sim, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 5""".stripMargin))

  private val d04 = Q(
    "d04_ann_ivf_adaptive",
    (s, dir) => {
      val aug = augEmbeddings(s, dir)
      val queries = aug.filter(col("vec_id") >= 100000)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.ivfTopKAdaptive(aug, queries, 5)
    },
    // Flipped from rows-only in r7 (the d03/d11 replay + the adaptive
    // probe rule): per query, cells rank by cosine and probe until the
    // PRECEDING cells already cover 25% of the corpus (max 8) — equal
    // work per query, not equal probe count. The hash certifies quantizer,
    // cell sizes, and the coverage cutoff together.
    Some("""WITH aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
      |  FROM embeddings WHERE vec_id % 25 = 0),
      |c0 AS (SELECT vec_id AS cid, e AS cv FROM aug WHERE vec_id < 16),
      |r0 AS (SELECT a.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY a.vec_id
      |           ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM aug a CROSS JOIN c0 c),
      |a0 AS (SELECT vec_id, cid AS cell FROM r0 WHERE rn = 1),
      |m1 AS (SELECT a0.cell, s.i, CAST(CAST(avg(round(a.e[s.i] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS v
      |       FROM a0 JOIN aug a USING (vec_id), generate_series(1, 64) s(i)
      |       GROUP BY a0.cell, s.i),
      |c1 AS (SELECT cell AS cid, list(v ORDER BY i) AS cv FROM m1 GROUP BY cell),
      |asg AS (SELECT a.vec_id, c.cid AS cell, a.e,
      |          row_number() OVER (PARTITION BY a.vec_id
      |            ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |        FROM aug a CROSS JOIN c1 c),
      |assigned AS (SELECT vec_id, cell, e FROM asg WHERE rn = 1),
      |cs AS (SELECT cell AS cid, count(*) AS cell_n FROM assigned GROUP BY 1),
      |tot AS (SELECT CAST(sum(cell_n) AS DOUBLE) AS tot FROM cs),
      |q AS (SELECT vec_id AS qid, e AS qv FROM aug WHERE vec_id >= 100000),
      |pc AS (SELECT q.qid, q.qv, c.cid, cs.cell_n,
      |         row_number() OVER (PARTITION BY q.qid
      |           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid DESC) AS rn,
      |         sum(cs.cell_n) OVER (PARTITION BY q.qid
      |           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
      |       FROM q CROSS JOIN c1 c JOIN cs ON cs.cid = c.cid),
      |probes AS (SELECT qid, qv, cid AS cell FROM pc CROSS JOIN tot
      |           WHERE rn <= 8 AND (rn = 1 OR coalesce(cum_before, 0) < tot.tot * 0.25)),
      |cand AS (
      |  SELECT p.qid, p.qv, s.vec_id, s.e
      |  FROM probes p JOIN assigned s USING (cell)
      |  WHERE s.vec_id <> p.qid),
      |ranked AS (
      |  SELECT qid, vec_id AS neighbor,
      |         list_cosine_similarity(e, qv) AS c,
      |         row_number() OVER (PARTITION BY qid
      |           ORDER BY list_cosine_similarity(e, qv) DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT qid, neighbor, round(c, 4) AS cos_sim, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Known-answer oracle for the ANN family: every planted query's rank-1
    * neighbor MUST be its exact twin at cosine 1.0. The full top-k set is
    * approximation-defined (not SQL-expressible), but this sub-assertion is —
    * a partial oracle on the same plan, run per ANN variant below. The
    * `CAST(1.0 AS DOUBLE)` keeps DuckDB from typing cos_sim DECIMAL.
    */
  private val twinRank1Sql: String =
    """SELECT CAST(vec_id + 100000 AS BIGINT) AS qid, vec_id AS neighbor,
      |       CAST(1.0 AS DOUBLE) AS cos_sim, CAST(1 AS INT) AS rank
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  private def annTwinQuery(
      topK: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => topK(s, dir).filter(col("rank") === 1)

  private val d05 = Q(
    "d05_lsh_twin_rank1",
    annTwinQuery((s, dir) => d02.fn(s, dir)),
    Some(twinRank1Sql))

  private val d06 = Q(
    "d06_ivf_twin_rank1",
    annTwinQuery((s, dir) => d03.fn(s, dir)),
    Some(twinRank1Sql))

  private val d07 = Q(
    "d07_ivf_adaptive_twin_rank1",
    annTwinQuery((s, dir) => d04.fn(s, dir)),
    Some(twinRank1Sql))

  private val d08 = Q(
    "d08_ann_pq",
    (s, dir) => {
      // PQ-ADC: 8-byte codes scanned instead of 256-byte vectors, exact
      // re-rank of the per-query shortlist. Codebook training + encoding
      // not SQL-expressible; twin recall proven in d09 + spec.
      // Registered with the MEASURED-GOOD knobs (§6 recall probe, re-run
      // r6 at the 100× corpus): 6-bit codebooks + re-rank ×32 hold recall
      // 0.686 ≈ IVF, where the 4-bit/×4 default degrades to 0.136 and —
      // the r6 re-measurement that corrected the r4 note — kc=64 with only
      // ×8 re-rank reaches 0.428: the re-rank budget stays the dominant
      // recall knob even at 6-bit resolution, and it's nearly free (the
      // ADC scan dominates; ×32 measured no slower than ×8). The 4-bit
      // baseline remains a ScaleProbe point (ann mode, "d08_pq").
      val aug = augEmbeddings(s, dir)
      val queries = aug.filter(col("vec_id") >= 100000)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.pqTopK(aug, queries, 5, kc = 64, rerankFactor = 32)
    },
    // Flipped from rows-only in r7: the full PQ pipeline replayed in SQL —
    // unit normalization (float-precision squares via CAST-to-REAL, the
    // same bit pattern Spark's float multiply produces), per-subspace
    // seed assignment + one Lloyd round (FLOAT-cast means), re-encode,
    // per-query LUT dots, ADC sum in subspace order, the 160-deep
    // shortlist cut (adc DESC, vec_id), and the exact-cosine re-rank.
    // Every argmin/argmax tie-break is replicated; the d09 twin stays as
    // the planted-recall companion. The SQL is generated (explicit 8-term
    // sums keep double accumulation order identical to Spark's fold).
    Some(pqOracleSql))

  private val d09 = Q(
    "d09_pq_twin_rank1",
    annTwinQuery((s, dir) => d08.fn(s, dir)),
    Some(twinRank1Sql))

  private val d10 = Q(
    "d10_int8_quant",
    // int8 embedding quantization — the storage-side 100 TB lever PQ's
    // 8 B/vec sits beyond: per-vector absmax scaling to one byte per dim
    // (4× smaller than float32, dequant = code·scale) with the
    // quantization error measured in the same pass. All scalar math in
    // codegen'd higher-order functions, one scan, no shuffle; the oracle
    // mirrors scale, the full code CHECKSUM (one mis-rounded code cannot
    // hash-match), extrema, and mean abs dequantization error.
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val dbl = (c: Column) => c.cast("double")
      // the raw scale column must NOT share the output alias's name:
      // Spark 4's lateral column alias resolution lets the select's own
      // `round(.,6) AS scale` shadow the input column inside sibling
      // expressions, silently quantizing with the ROUNDED scale (caught by
      // the oracle: one code flipped at a rounding boundary)
      val code = (v: Column) => round(dbl(v) / col("_scale_raw"))
      emb
        .withColumn("_scale_raw",
          array_max(transform(col("embedding"), v => abs(dbl(v)))) / 127.0)
        .filter(col("_scale_raw") > 0) // a zero vector has nothing to quantize
        .select(col("vec_id"), round(col("_scale_raw"), 6).as("scale"),
          aggregate(transform(col("embedding"), code), lit(0L),
            (acc, x) => acc + x.cast("long")).as("code_sum"),
          array_min(transform(col("embedding"), v => code(v).cast("int")))
            .as("code_min"),
          array_max(transform(col("embedding"), v => code(v).cast("int")))
            .as("code_max"),
          round(aggregate(transform(col("embedding"),
              v => abs(code(v) * col("_scale_raw") - dbl(v))), lit(0.0d),
            (acc, x) => acc + x) / size(col("embedding")), 6).as("mean_abs_err"))
    },
    Some("""WITH e AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  CAST(list_sum(list_transform(embedding,
      |        x -> round(CAST(x AS DOUBLE) / scale))) AS BIGINT) AS code_sum,
      |  CAST(list_min(list_transform(embedding,
      |        x -> round(CAST(x AS DOUBLE) / scale))) AS INT) AS code_min,
      |  CAST(list_max(list_transform(embedding,
      |        x -> round(CAST(x AS DOUBLE) / scale))) AS INT) AS code_max,
      |  round(list_sum(list_transform(embedding,
      |        x -> abs(round(CAST(x AS DOUBLE) / scale) * scale - CAST(x AS DOUBLE))))
      |        / len(embedding), 6) AS mean_abs_err
      |FROM e WHERE scale > 0""".stripMargin))

  private val d11 = Q(
    "d11_kmeans_cells",
    // First-class distributed k-means (8 cells, 2 Lloyd iterations over the
    // cosine quantizer every IVF/SemDeDup consumer shares) — previously
    // internal-only machinery, now oracle-gated END TO END: the SQL mirror
    // replays seeds → assign → per-dim mean → FLOAT cast → assign → mean →
    // final assign entirely in DuckDB, so one flipped assignment or one
    // mis-averaged centroid coordinate anywhere in either iteration breaks
    // the hash. Cross-engine exactness rests on refineCentroids' FLOAT cast
    // quantizing away summation-order ulp drift (Similarity.kmeansAssign
    // doc); the cosine argmax ties break (cosine, cid)-max in both engines.
    (s, dir) => Similarity.kmeansAssign(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      k = 8, iters = 2),
    Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, e AS cv FROM emb WHERE vec_id < 8),
      |r0 AS (SELECT m.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY m.vec_id
      |           ORDER BY list_cosine_similarity(m.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM emb m CROSS JOIN c0 c),
      |a0 AS (SELECT vec_id, cid AS cell FROM r0 WHERE rn = 1),
      |m1 AS (SELECT a0.cell, s.i,
      |         CAST(CAST(avg(round(m.e[s.i] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS v
      |       FROM a0 JOIN emb m USING (vec_id), generate_series(1, 64) s(i)
      |       GROUP BY a0.cell, s.i),
      |c1 AS (SELECT cell AS cid, list(v ORDER BY i) AS cv FROM m1 GROUP BY cell),
      |r1 AS (SELECT m.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY m.vec_id
      |           ORDER BY list_cosine_similarity(m.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM emb m CROSS JOIN c1 c),
      |a1 AS (SELECT vec_id, cid AS cell FROM r1 WHERE rn = 1),
      |m2 AS (SELECT a1.cell, s.i,
      |         CAST(CAST(avg(round(m.e[s.i] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS v
      |       FROM a1 JOIN emb m USING (vec_id), generate_series(1, 64) s(i)
      |       GROUP BY a1.cell, s.i),
      |c2 AS (SELECT cell AS cid, list(v ORDER BY i) AS cv FROM m2 GROUP BY cell),
      |r2 AS (SELECT m.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY m.vec_id
      |           ORDER BY list_cosine_similarity(m.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM emb m CROSS JOIN c2 c),
      |a2 AS (SELECT vec_id, cid AS cell FROM r2 WHERE rn = 1)
      |SELECT vec_id, cell,
      |       count(*) OVER (PARTITION BY cell) AS cell_size
      |FROM a2""".stripMargin))

  private val d12 = Q(
    "d12_ann_lsh_md5_replay",
    // Full-replay oracle twin of d02 (the c18 technique, vector edition):
    // the SAME hyperplane-LSH shape — random ±1 planes, per-table sketch
    // keys, bucket equi-join candidates, exact-cosine re-rank — with two
    // determinism substitutions that make every stage DuckDB-replayable:
    // plane signs come from an md5 parity both engines share, and the
    // hyperplane dot runs over integer-quantized components (round(x·1000))
    // so sign(Σ ±q_j) is exact integer arithmetic — float summation ORDER
    // can never flip a bucket. 16 planes = 2 tables × 8 bits, exact-bucket
    // probe (no multi-probe), cosine re-rank per the d01 conventions.
    // d02 stays the production path (codegen'd hyperplane_sketches, hot-
    // bucket guard, multi-probe); this twin prices the 64-dim × 16-plane
    // explode for the gate SF only.
    (s, dir) => {
      val aug = augEmbeddings(s, dir)
      val iv = aug.select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("iv"))
      val dots = iv.select(col("vec_id"), posexplode(col("iv")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"), col("x"),
          explode(expr("sequence(0, 15)")).as("p"))
        .withColumn("sgn", when(
          expr("cast(conv(substring(md5(concat(p, '_', j)), 32, 1), 16, 10) as int) % 2") === 1,
          lit(1L)).otherwise(lit(-1L)))
        .groupBy("vec_id", "p").agg(sum(col("x") * col("sgn")).as("dot"))
      val keys = dots
        .withColumn("tbl", expr("p div 8"))
        .withColumn("bit", expr("p % 8"))
        .groupBy("vec_id", "tbl")
        .agg(sum(when(col("dot") > 0,
          expr("shiftleft(cast(1 as bigint), bit)")).otherwise(0L)).as("key"))
      val cand = keys.as("c").join(
          keys.filter(col("vec_id") >= 100000).as("q"),
          col("c.tbl") === col("q.tbl") && col("c.key") === col("q.key")
            && col("c.vec_id") =!= col("q.vec_id"))
        .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vec_id"))
        .distinct()
      val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
      cand
        .join(aug, "vec_id")
        .join(aug.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
        .withColumn("cos_sim",
          graft.functions.vec_cosine(col("embedding"), col("qv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("vec_id").as("neighbor"),
          round(col("cos_sim"), 4).as("cos_sim"), col("rank"))
    },
    // embeddings are 64-d in every testdata vintage (the bounded-series
    // convention, as e20); cosine re-rank follows d01's DOUBLE[] casts
    Some("""WITH aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
      |  WHERE vec_id % 25 = 0),
      |iv AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS iv
      |  FROM aug),
      |dots AS (
      |  SELECT vec_id, p,
      |         sum(iv[j + 1] * (CASE WHEN ('0x' || substr(md5(p || '_' || j), 32, 1))::BIGINT % 2 = 1
      |                          THEN 1 ELSE -1 END)) AS dot
      |  FROM iv
      |  CROSS JOIN (SELECT unnest(range(64)) AS j) dj
      |  CROSS JOIN (SELECT unnest(range(16)) AS p) pp
      |  GROUP BY vec_id, p),
      |keys AS (
      |  SELECT vec_id, p // 8 AS tbl,
      |         sum(CASE WHEN dot > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS key
      |  FROM dots GROUP BY vec_id, p // 8),
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS qid, c.vec_id
      |  FROM keys c JOIN keys q
      |    ON c.tbl = q.tbl AND c.key = q.key AND c.vec_id <> q.vec_id
      |  WHERE q.vec_id >= 100000),
      |scored AS (
      |  SELECT cand.qid, cand.vec_id AS neighbor,
      |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                           CAST(qa.embedding AS DOUBLE[])) AS cs,
      |    row_number() OVER (PARTITION BY cand.qid
      |      ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                 CAST(qa.embedding AS DOUBLE[])) DESC, cand.vec_id) AS rank
      |  FROM cand
      |  JOIN aug a ON a.vec_id = cand.vec_id
      |  JOIN aug qa ON qa.vec_id = cand.qid)
      |SELECT qid, neighbor, round(cs, 4) AS cos_sim, CAST(rank AS INT) AS rank
      |FROM scored WHERE rank <= 5""".stripMargin))

  private val d13 = Q(
    "d13_sparse_cosine",
    // Sparse cosine top-k over word-3-gram TF-IDF — the inverted-index dual
    // of d01's dense path: candidate pairs come from a postings self-join on
    // the gram (never all-pairs), with a document-frequency cap as the
    // ubiquitous-term guard (a gram in >max(10, N/10) docs carries no signal
    // and is what makes term joins quadratic at scale). Weights are INTEGER
    // (tf × bit-width-of(N div df) — a power-of-two-quantized idf), so dot
    // products and norms are exact BIGINT sums whose value is independent of
    // aggregation order; the only float ops are one sqrt and one division
    // over identical integers, bit-deterministic in both engines. At 100 TB:
    // postings shuffle-partitioned by gram (pair fanout ≤ df_cap² per gram),
    // pair aggregation and the top-k window both partitioned by doc_id.
    // Grams are keyed by xxhash64 at the explode (the c11/e22 8-byte
    // shuffle-key discipline); the oracle groups on the RAW gram strings,
    // so a key collision would redden the hash-compare instead of passing
    // silently. Similarity.sparseCosineTopK documents the tf/posting cache
    // discipline and the hand-back contract.
    (s, dir) => Similarity.sparseCosineTopK(
      s, Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3),
      |grams AS (
      |  SELECT doc_id,
      |         unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                 for i in range(1, len(t) - 1)]) AS gram
      |  FROM toks),
      |tf AS (SELECT doc_id, gram, count(*) AS tf FROM grams GROUP BY 1, 2),
      |nn AS (SELECT count(*) AS n FROM documents),
      |dfq AS (
      |  SELECT gram, count(*) AS df FROM tf GROUP BY 1
      |  HAVING count(*) <= greatest(10, (SELECT n FROM nn) // 10)),
      |posting AS (
      |  SELECT t.doc_id, t.gram,
      |         t.tf * length(bin(CAST(floor(CAST((SELECT n FROM nn) AS DOUBLE) / d.df)
      |                                AS BIGINT))) AS wq
      |  FROM tf t JOIN dfq d USING (gram)),
      |norms AS (SELECT doc_id, sum(wq * wq) AS n2 FROM posting GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, sum(a.wq * b.wq) AS dot
      |  FROM posting a JOIN posting b
      |    ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT ida AS doc_id, idb AS neighbor_id, dot FROM pairs
      |  UNION ALL
      |  SELECT idb AS doc_id, ida AS neighbor_id, dot FROM pairs),
      |scored AS (
      |  SELECT s.doc_id, s.neighbor_id,
      |         CAST(s.dot AS DOUBLE)
      |           / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS score
      |  FROM sym s JOIN norms na ON s.doc_id = na.doc_id
      |             JOIN norms nb ON s.neighbor_id = nb.doc_id),
      |ranked AS (
      |  SELECT doc_id, neighbor_id, score,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT doc_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       round(score, 6) AS cosine
      |FROM ranked WHERE rank <= 3""".stripMargin))

  private val d14 = Q(
    "d14_maxsim",
    // Late-interaction (ColBERT-style MaxSim) retrieval — the multi-vector
    // complement to d01's single-vector path: a "document" is a BAG of
    // vectors (8 consecutive vec_ids here), and score(q, d) =
    // Σ_{query tokens} max_{doc vectors} cos — two exact aggregations over
    // the token-pair scores, which is precisely the groupBy shape Spark
    // plans well (max combines map-side, sum is |docs|-keyed). Determinism:
    // components integer-quantized (round(x·1000), the d12 convention),
    // dots and norms exact BIGINT via zip_with/aggregate HOFs, each pair
    // score floored to integer millionths AFTER the one sqrt+divide — so
    // max/sum are order-independent integer ops and the full pipeline
    // hash-checks. Self-retrieval is a built-in known answer: a query doc's
    // own tokens score exactly 1e6 each ⇒ maxsim(self) = 8e6, rank 1
    // (asserted in QueriesRound8bSpec). Scale: this is the exact brute
    // force (query side broadcast, BNLJ — never a shuffle of the corpus);
    // the serving path at 100 TB composes per-token probeIndex IVF probes
    // into a shortlist and runs this scorer on it.
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
        .select(expr("vec_id div 8").as("doc_id"), col("vec_id"), col("embedding"))
      val queries = corpus.filter(col("doc_id").isin(3, 17, 29))
        .select(col("doc_id").as("qid"), col("vec_id").as("qtok"), col("embedding"))
      Similarity.maxSim(corpus, queries)
    },
    Some("""WITH iv AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS iv
      |  FROM embeddings),
      |nn AS (
      |  SELECT vec_id, iv,
      |         CAST(list_sum(list_transform(iv, x -> x * x)) AS BIGINT) AS n2
      |  FROM iv),
      |dv AS (
      |  SELECT vec_id // 8 AS doc_id, vec_id, iv, n2 FROM nn WHERE n2 > 0),
      |qv AS (
      |  SELECT doc_id AS qid, vec_id AS qtok, iv AS qiv, n2 AS qn2
      |  FROM dv WHERE doc_id IN (3, 17, 29)),
      |pairs AS (
      |  SELECT q.qid, q.qtok, d.doc_id,
      |         CAST(list_sum([q.qiv[k + 1] * d.iv[k + 1] for k in range(64)])
      |              AS BIGINT) AS dot,
      |         d.n2, q.qn2
      |  FROM qv q CROSS JOIN dv d),
      |scores AS (
      |  SELECT qid, qtok, doc_id,
      |         CAST(floor(1e6 * dot
      |                    / sqrt(CAST(n2 AS DOUBLE) * CAST(qn2 AS DOUBLE)))
      |              AS BIGINT) AS score
      |  FROM pairs),
      |best AS (
      |  SELECT qid, qtok, doc_id, max(score) AS mx FROM scores GROUP BY 1, 2, 3),
      |ms AS (
      |  SELECT qid, doc_id, CAST(sum(mx) AS BIGINT) AS maxsim FROM best GROUP BY 1, 2),
      |ranked AS (
      |  SELECT qid, doc_id, maxsim,
      |         row_number() OVER (PARTITION BY qid
      |           ORDER BY maxsim DESC, doc_id) AS rank
      |  FROM ms)
      |SELECT qid, CAST(rank AS INT) AS rank, doc_id, maxsim
      |FROM ranked WHERE rank <= 3""".stripMargin))

  private val d15 = Q(
    "d15_maxsim_serving",
    // The 100 TB MaxSim SERVING composition d14's scaladoc declares
    // (Similarity.scala maxSim / probeIndexGrouped): corpus vectors live in
    // a written disk IVF index; each query TOKEN probes ONLY its nProbe
    // cells; probe hits map to a DOC shortlist; the exact integer MaxSim
    // scorer runs on shortlisted docs only — scoring the full corpus is
    // never an option at scale. Since r13 the CERTIFIED index is the
    // GROUPED two-level layout (writeIndexGrouped: ⌈√k⌉ group dirs,
    // cell-sorted files) — the flat one-dir-per-cell layout measurably
    // bends at the third decade (probe 7.63 s flat vs 1.82 s grouped at
    // 2M vectors / 4000 cells, SURVEY §15 serving addendum: listing +
    // tiny-file floor ∝ nCells), so the gate certifies the layout you'd
    // deploy. Flat writeIndex/probeIndex stays as the spec-level baseline,
    // and IvfIndexSpec pins grouped ≡ flat results on the same assignment.
    // In-gate layout asserts, the b50 forced-regime way: the probe scan
    // must prune group dirs at the LISTING level (`grp` PartitionFilter)
    // AND carry the `cell` predicate as a data filter (parquet min/max on
    // the sorted cell column row-group-skips inside group files).
    // Known answer the d05 way: every 25th doc gets a planted twin doc
    // (same 8 vectors at doc_id+100000 / vec_id+800000) used as the query;
    // the twin token's exact copy is cosine-1 in its own probed cell
    // (identical argmax tie-break), so the ORIGINAL doc always survives the
    // prune and scores the analytic ceiling — floor(1e6·cos)=1e6 per
    // surviving token, Σ = nonzero_tokens·1e6 — while any other doc is
    // strictly below it and the twin itself ties but loses the doc_id
    // tie-break. rank-1 is therefore exact and hash-checkable even though
    // the shortlist is approximation-defined.
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus = emb
        .select(expr("vec_id div 8").as("doc_id"), col("vec_id"), col("embedding"))
      val twins = corpus.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 100000).as("qid"),
          (col("vec_id") + 800000).as("qtok"), col("embedding"))
      val centroids = Similarity.ivfCentroids(emb, nCells = 16, refineIters = 1)
      val idxDir = operators.Scratch.dir("d15") + "/idx"
      Similarity.writeIndexGrouped(emb, centroids, idxDir, layoutGroups = 4)
      val tokenProbes = twins.select(col("qtok").as("qid"), col("embedding").as("qv"))
      val hits = Similarity.probeIndexGrouped(s, idxDir, tokenProbes, centroids,
        k = 32, nProbe = 4)
      val idxScans = physicalNodes(hits.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.exists(_.references.exists(_.name == "grp")) => f
      }
      require(idxScans.nonEmpty,
        s"grouped-index scan must prune `grp` dirs at the listing level, plan:\n" +
          hits.queryExecution.executedPlan)
      require(idxScans.forall(
        _.dataFilters.exists(_.references.exists(_.name == "cell"))),
        s"`cell` predicate must reach the grouped-index scan as a data filter " +
          s"(row-group skip on the sorted cell column), plan:\n" +
          hits.queryExecution.executedPlan)
      // forced-prune regime (the b50 pattern): at the gate SF the full twin
      // token set legitimately probes every cell, so the asserts above prove
      // the filters EXIST but their In-lists are total. ONE token at
      // nProbe=1 routes to exactly one cell → one group, and the scan's
      // post-pruning listing (selectedPartitions, the ground truth the
      // planner actually read) must hold exactly ONE of the ≥2 group dirs —
      // the prune observed as a strict subset, every Verify/Bench run.
      val grpDirs = new java.io.File(idxDir).list().count(_.startsWith("grp="))
      require(grpDirs >= 2, s"grouped layout must have ≥2 group dirs, got $grpDirs")
      val oneHits = Similarity.probeIndexGrouped(s, idxDir,
        tokenProbes.orderBy("qid").limit(1), centroids, k = 4, nProbe = 1)
      val oneListed = physicalNodes(oneHits.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.exists(_.references.exists(_.name == "grp")) =>
          f.selectedPartitions.partitionCount
      }
      require(oneListed.nonEmpty && oneListed.forall(_ == 1),
        s"nProbe=1 single-token probe must list exactly one of $grpDirs group " +
          s"dirs, listed $oneListed — the group prune is not reaching the file listing")
      val shortlist = hits.select(expr("neighbor div 8").as("doc_id")).distinct()
      Similarity.maxSim(corpus.join(shortlist, "doc_id"), twins)
        .filter(col("rank") === 1)
    },
    Some("""WITH nz AS (
      |  SELECT vec_id // 8 AS doc_id, count(*) AS nzt
      |  FROM embeddings
      |  WHERE list_sum(list_transform(embedding,
      |          x -> CAST(round(x * 1000) AS BIGINT)
      |               * CAST(round(x * 1000) AS BIGINT))) > 0
      |  GROUP BY 1)
      |SELECT CAST(doc_id + 100000 AS BIGINT) AS qid, CAST(1 AS INT) AS rank,
      |       doc_id, CAST(nzt * 1000000 AS BIGINT) AS maxsim
      |FROM nz WHERE doc_id % 25 = 0""".stripMargin))

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

  private val e02 = Q(
    "e02_quality_score",
    (s, dir) => {
      val chars = length(col("text"))
      val toks = size(split(trim(col("text")), "\\s+"))
      val punct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
      val stops = size(expr(
        "regexp_extract_all(text, '\\\\b(the|a|and|of|to|in|is|it|for|on)\\\\b', 0)"))
      val punctRatio = punct.cast("double") / chars
      val stopRatio = stops.cast("double") / toks
      Tables.documents(s, dir).select(
        col("doc_id"),
        chars.as("chars"),
        toks.as("toks"),
        round(punctRatio, 4).as("punct_ratio"),
        round(stopRatio, 4).as("stop_ratio"),
        round(
          least(toks.cast("double") / 100.0, lit(1.0)) * 0.3 +
            (lit(1.0) - punctRatio) * 0.3 +
            least(stopRatio * 4.0, lit(1.0)) * 0.4, 4).as("quality"))
    },
    Some("""SELECT doc_id,
      |  CAST(length(text) AS INT) AS chars,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS toks,
      |  round(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text), 4) AS punct_ratio,
      |  round(CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|for|on)\b')) AS DOUBLE)
      |        / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stop_ratio,
      |  round(
      |    least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
      |    (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text)) * 0.3 +
      |    least(CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|for|on)\b')) AS DOUBLE)
      |          / len(regexp_split_to_array(trim(text), '\s+')) * 4.0, 1.0) * 0.4, 4) AS quality
      |FROM documents""".stripMargin),
    bench = true)

  private val e03 = Q(
    "e03_langid",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        graft.functions.lang_id(col("text")).as("lang_pred"),
        col("lang").as("lang_label")),
    // Exact mirror of TextHash.langId's stopword-profile argmax: per-profile
    // membership counts over the normalized tokens, first-profile-wins tie
    // break (the strict `>` update loop ≡ first profile reaching the max),
    // 'und' when every score is 0. The CJK-ratio branch is omitted: the
    // corpus is verified pure ASCII (zero non-ASCII docs), so it never
    // fires — Java Character classes aren't RE2-expressible in general.
    Some("""WITH toks AS (
      |  SELECT doc_id,
      |         regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id,
      |    len(list_filter(t, x -> x IN ('the','and','of','to','in','is','it',
      |                                  'you','that','for','a'))) AS s_en,
      |    len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht',
      |                                  'mit','ein','zu','den'))) AS s_de,
      |    len(list_filter(t, x -> x IN ('le','la','les','et','est','pas',
      |                                  'pour','que','une','dans'))) AS s_fr,
      |    len(list_filter(t, x -> x IN ('el','los','y','es','no','por','las',
      |                                  'una','lo','como'))) AS s_es
      |  FROM toks)
      |SELECT s.doc_id,
      |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
      |       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
      |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
      |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
      |       ELSE 'es' END AS lang_pred,
      |  d.lang AS lang_label
      |FROM scores s JOIN documents d USING (doc_id)""".stripMargin))

  private val e04 = Q(
    "e04_fingerprint",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary")).as("fp")),
    Some("""SELECT doc_id,
      |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin))

  private val e05 = Q(
    "e05_winnow",
    // Winnowing (Schleimer et al., SIGMOD'03) in pure declarative form so the
    // selection is DuckDB-reproducible: gram hash = first 16 hex chars of
    // md5(char 8-gram) over the normalized text, fingerprints = distinct
    // minima of each 4-gram window (lexicographic min on fixed-width hex =
    // unsigned numeric min; ties pick equal values, so tie-break order can't
    // change the output SET). All builtins — codegen end to end. The
    // rolling-hash variant ([[graft.functions.winnow]], one multiply per
    // gram vs an md5) remains the 100 TB fast path, property-tested in
    // TextAnalysisSpec; this query pins the algorithm itself to an oracle.
    (s, dir) => {
      val k = 8; val w = 4
      // n and gs are FENCED: the window transform references gs three times
      // and each gram references n twice — CollapseProject would otherwise
      // inline the whole gram-array computation into every lambda reference
      // (≈|windows|×|grams| md5+regexp evaluations per doc instead of
      // |grams|; measured 16 min vs <1 s at sf0.01)
      Tables.documents(s, dir)
        .withColumn("n", graft.functions.opt_fence(
          trim(regexp_replace(lower(col("text")), "\\s+", " "))))
        .filter(length(col("n")) >= k)
        .withColumn("gs", graft.functions.opt_fence(expr(
          s"transform(sequence(1, length(n) - $k + 1), i -> substring(md5(substring(n, i, $k)), 1, 16))")))
        .withColumn("fps", expr(
          s"array_distinct(transform(sequence(1, greatest(size(gs) - $w + 1, 1), 1), s -> array_min(slice(gs, s, least($w, size(gs))))))"))
        .select(col("doc_id"), explode(col("fps")).as("fp"))
    },
    Some("""WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         list_transform(range(1, length(n) - 8 + 2),
      |                        i -> substr(md5(substr(n, i, 8)), 1, 16)) AS gs
      |  FROM norm WHERE length(n) >= 8),
      |fps AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           range(1, greatest(len(gs) - 4 + 1, 1) + 1),
      |           s -> list_aggregate(list_slice(gs, s, s + least(4, len(gs)) - 1), 'min'))) AS fp
      |  FROM g)
      |SELECT doc_id, unnest(fp) AS fp FROM fps""".stripMargin))

  /** BPE-style pre-tokenization pattern (GPT-2 family, simplified to the
    * RE2-safe subset so DuckDB oracles match): leading-space word / number /
    * punctuation runs. The SINGLE definition behind e06/e13 (Spark and SQL
    * sides) and the packing spec — edit here, everything stays in sync.
    */
  private[graft] val BpeTokenPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"

  /** Token count of `text` under [[BpeTokenPattern]] (Spark side). */
  private[graft] def bpeTokenCount =
    size(expr(s"regexp_extract_all(text, '$BpeTokenPattern', 0)"))

  private val e06 = Q(
    "e06_bpe_tokens",
    (s, dir) =>
      // token budget estimation for training pipelines
      Tables.documents(s, dir).select(
        col("doc_id"),
        bpeTokenCount.as("bpe_tokens"),
        (length(col("text")).cast("double") / bpeTokenCount)
          .cast("double").as("chars_per_token_raw"))
        .select(col("doc_id"), col("bpe_tokens"),
          round(col("chars_per_token_raw"), 4).as("chars_per_token")),
    Some(s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$BpeTokenPattern')) AS INT) AS bpe_tokens,
      |  round(CAST(length(text) AS DOUBLE)
      |        / len(regexp_extract_all(text, '$BpeTokenPattern')), 4) AS chars_per_token
      |FROM documents""".stripMargin))

  private val e07 = Q(
    "e07_tfidf_top_terms",
    (s, dir) => {
      // classic TF-IDF over the corpus: explode tokens → document frequency
      // → score → top-3 terms per doc. explode + two aggregations + a
      // window, all shuffle-partitioned by token/doc.
      val docs = Tables.documents(s, dir)
      val n = docs.count() // corpus size: one tiny job, not a driver loop
      val terms = docs.select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_raw").desc, col("term"))
      tf.join(df, "term")
        .withColumn("score_raw", col("tf") * log(lit(n.toDouble) / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"),
          round(col("score_raw"), 4).as("tfidf"))
    },
    Some("""WITH terms AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms WHERE length(term) > 0 GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf * ln(n.n / df.df) AS score_raw,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY tf * ln(n.n / df.df) DESC, term) AS rank
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, CAST(rank AS INT) AS rank, term, round(score_raw, 4) AS tfidf
      |FROM scored WHERE rank <= 3""".stripMargin))

  private val e08 = Q(
    "e08_pii_redact",
    (s, dir) => {
      // The reference's GDPR anonymization (lib.rs:253-271 masks client IPs)
      // extended to free text — the training-corpus version of the same
      // obligation. The corpus is synthetic word-salad, so deterministic PII
      // (email, phone, private IP) is planted per doc and must come back out.
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      val ipRe    = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val withPii = Tables.documents(s, dir).withColumn("text_pii",
        concat(col("text"), format_string(
          " contact user%d@mail-%d.example.org or +1-555-%04d from 10.%d.%d.%d",
          col("doc_id") % 1000, col("doc_id") % 7, col("doc_id") % 10000,
          col("doc_id") % 2, col("doc_id") % 16, col("doc_id") % 16)))
      // lit() patterns sidestep SQL string-literal escaping (expr("'\+...'")
      // would eat the backslash and leave an invalid dangling quantifier)
      withPii.select(
        col("doc_id"),
        (size(regexp_extract_all(col("text_pii"), lit(emailRe), lit(0))) +
          size(regexp_extract_all(col("text_pii"), lit(phoneRe), lit(0))) +
          size(regexp_extract_all(col("text_pii"), lit(ipRe), lit(0)))).as("pii_found"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text_pii"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          ipRe, "<IP>").as("redacted"))
    },
    Some("""WITH pii AS (
      |  SELECT doc_id,
      |         text || printf(' contact user%d@mail-%d.example.org or +1-555-%04d from 10.%d.%d.%d',
      |                        doc_id % 1000, doc_id % 7, doc_id % 10000,
      |                        doc_id % 2, doc_id % 16, doc_id % 16) AS text_pii
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(text_pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |          + len(regexp_extract_all(text_pii, '\+1-555-[0-9]{4}'))
      |          + len(regexp_extract_all(text_pii, '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS pii_found,
      |       regexp_replace(
      |         regexp_replace(
      |           regexp_replace(text_pii,
      |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |           '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      |         '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
      |FROM pii""".stripMargin))

  private val e09 = Q(
    "e09_repetition",
    (s, dir) => {
      // Gopher-style repetition signals: fraction of tokens that are the
      // single most frequent token, and distinct/total ratio. Two
      // shuffle-partitioned aggs (doc×term, then doc) — explode never leaves
      // the partition a doc's tokens hash to. The repetitive flag compares in
      // integer arithmetic (top*5 > total) so no float boundary can flip it.
      val terms = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
      terms.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("toks"), count(lit(1)).as("uniq_toks"),
          max("cnt").as("top_cnt"))
        .select(col("doc_id"), col("toks"), col("uniq_toks"),
          round(col("uniq_toks").cast("double") / col("toks"), 4).as("distinct_ratio"),
          round(col("top_cnt").cast("double") / col("toks"), 4).as("top_tok_ratio"),
          (col("top_cnt") * 5 > col("toks")).as("repetitive"))
    },
    Some("""WITH terms AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |per_term AS (
      |  SELECT doc_id, term, count(*) AS cnt
      |  FROM terms WHERE length(term) > 0 GROUP BY 1, 2),
      |per_doc AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS toks, count(*) AS uniq_toks,
      |         CAST(max(cnt) AS BIGINT) AS top_cnt
      |  FROM per_term GROUP BY 1)
      |SELECT doc_id, toks, uniq_toks,
      |       round(CAST(uniq_toks AS DOUBLE) / toks, 4) AS distinct_ratio,
      |       round(CAST(top_cnt AS DOUBLE) / toks, 4) AS top_tok_ratio,
      |       top_cnt * 5 > toks AS repetitive
      |FROM per_doc""".stripMargin))

  private val e10 = Q(
    "e10_domain_mix",
    // domain-reweighting sampler: four sources get explicit token-budget
    // shares (src4's saturates at rate 1), the rest are excluded. The
    // sampling coin is pure BIGINT arithmetic so the oracle mirrors the
    // exact row set, not just counts.
    (s, dir) => operators.Mixing.domainMix(
      Tables.documents(s, dir), "doc_id", "text", "source",
      Map("src0" -> 0.30, "src1" -> 0.25, "src2" -> 0.20, "src4" -> 0.60),
      budgetTokens = 3000L),
    Some("""WITH toks AS (
      |  SELECT doc_id, source AS domain,
      |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok_cnt
      |  FROM documents),
      |tot AS (SELECT domain, CAST(sum(tok_cnt) AS BIGINT) AS domain_tokens
      |        FROM toks GROUP BY 1),
      |shares(domain, share) AS (
      |  VALUES ('src0', CAST(0.30 AS DOUBLE)), ('src1', CAST(0.25 AS DOUBLE)),
      |         ('src2', CAST(0.20 AS DOUBLE)), ('src4', CAST(0.60 AS DOUBLE))),
      |rates AS (
      |  SELECT t.domain, least(CAST(1.0 AS DOUBLE),
      |         s.share * CAST(3000 AS DOUBLE) / CAST(t.domain_tokens AS DOUBLE)) AS rate
      |  FROM tot t JOIN shares s USING (domain))
      |SELECT doc_id, t.domain, tok_cnt
      |FROM toks t JOIN rates r ON t.domain = r.domain
      |WHERE ((doc_id % 1000000) * 2654435761) % 1000000 < r.rate * 1000000""".stripMargin))

  private val e11 = Q(
    "e11_url_dedup",
    (s, dir) => {
      // URL-level dedup (the Common-Crawl pre-filter: one fetch per
      // canonical URL). Synthetic messy URLs — mixed-case hosts, trailing
      // slashes, shuffled tracking params (utm_*, source tags), fragments —
      // are canonicalized (lower host, strip trailing slash / tracking
      // params / fragment, keep content params) and grouped: keeper = min
      // id per canonical URL. All codegen'd builtins; scan → one hash-agg.
      val full = httpLog(s, dir).select(col("log_id"),
        concat(lit("https://"),
          when(col("log_id") % 2 === 0,
            format_string("H%d.EXAMPLE.COM", col("resource_id")))
            .otherwise(format_string("h%d.example.com", col("resource_id"))),
          col("url"),
          when(col("log_id") % 3 === 0, lit("/")).otherwise(lit("")),
          when(col("log_id") % 2 === 0,
            format_string("?utm_campaign=c%d&page=%d", col("log_id") % 3, col("log_id") % 7))
            .otherwise(format_string("?page=%d&utm_source=news", col("log_id") % 7)),
          when(col("log_id") % 5 === 0, format_string("#s%d", col("log_id") % 4))
            .otherwise(lit(""))).as("full_url"))
      full
        .withColumn("canonical_url", concat(
          lower(expr("parse_url(full_url, 'HOST')")),
          regexp_replace(expr("parse_url(full_url, 'PATH')"), "/$", ""),
          lit("?page="), expr("parse_url(full_url, 'QUERY', 'page')")))
        .groupBy("canonical_url")
        .agg(min("log_id").as("keeper_id"),
          countDistinct("full_url").as("n_variants"),
          count(lit(1)).as("n_events"))
    },
    Some(s"""WITH ${HttpLog.cteBody},
      |furl AS (
      |  SELECT log_id,
      |    'https://' ||
      |    CASE WHEN log_id % 2 = 0 THEN printf('H%d.EXAMPLE.COM', resource_id)
      |         ELSE printf('h%d.example.com', resource_id) END ||
      |    url || CASE WHEN log_id % 3 = 0 THEN '/' ELSE '' END ||
      |    CASE WHEN log_id % 2 = 0
      |         THEN printf('?utm_campaign=c%d&page=%d', log_id % 3, log_id % 7)
      |         ELSE printf('?page=%d&utm_source=news', log_id % 7) END ||
      |    CASE WHEN log_id % 5 = 0 THEN printf('#s%d', log_id % 4) ELSE '' END
      |      AS full_url
      |  FROM http_log),
      |canon AS (
      |  SELECT log_id, full_url,
      |    lower(regexp_extract(full_url, '^https://([^/?#]+)', 1)) ||
      |    regexp_replace(regexp_extract(full_url, '^https://[^/?#]+([^?#]*)', 1),
      |                   '/$$', '') ||
      |    '?page=' || regexp_extract(full_url, '[?&]page=([0-9]+)', 1) AS canonical_url
      |  FROM furl)
      |SELECT canonical_url, min(log_id) AS keeper_id,
      |       count(DISTINCT full_url) AS n_variants, count(*) AS n_events
      |FROM canon GROUP BY 1""".stripMargin))

  private val e12 = Q(
    "e12_chunking",
    (s, dir) =>
      // fixed-window chunking with overlap (split-before-tokenize): pure
      // narrow ops, zero shuffle, ids deterministic under any partitioning
      operators.Chunking.chunk(
        Tables.documents(s, dir), "doc_id", "text",
        chunkChars = 200, overlapChars = 50)
        .withColumn("fp", md5(col("chunk_text").cast("binary"))),
    Some("""SELECT doc_id,
      |       CAST(off // 150 AS INT) AS chunk_id,
      |       CAST(off AS INT) AS chunk_off,
      |       substr(text, off + 1, 200) AS chunk_text,
      |       CAST(len(substr(text, off + 1, 200)) AS INT) AS chunk_chars,
      |       md5(substr(text, off + 1, 200)) AS fp
      |FROM (SELECT doc_id, text,
      |             unnest(range(0, greatest(len(text) - 50, 1), 150)) AS off
      |      FROM documents WHERE len(text) > 0)""".stripMargin))

  private val e13 = Q(
    "e13_seq_packing",
    (s, dir) =>
      // concat-and-slice sequence packing: e06's BPE-ish token counts laid
      // end to end in doc order, sliced into 512-token training windows.
      // The global prefix sum is two-level (group totals + partitioned
      // window) — never a single-partition window; see Chunking.pack
      operators.Chunking.pack(
        Tables.documents(s, dir).select(
          col("doc_id"), bpeTokenCount.as("tok_count")),
        "doc_id", "tok_count", seqLen = 512, groupSize = 64),
    // window SUM over BIGINT is HUGEINT in DuckDB → cast; `//` is exact
    // integer division like Spark's `div`
    Some(s"""WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_extract_all(text,
      |              '$BpeTokenPattern')) AS BIGINT)
      |           AS tok_count
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, tok_count,
      |         CAST(COALESCE(SUM(tok_count) OVER (ORDER BY doc_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |              AS BIGINT) AS start_off
      |  FROM t WHERE tok_count > 0)
      |SELECT doc_id, tok_count, start_off,
      |       start_off // 512 AS bin_first,
      |       (start_off + tok_count - 1) // 512 AS bin_last,
      |       CAST((start_off + tok_count - 1) // 512 - start_off // 512 + 1
      |            AS INT) AS bins_spanned
      |FROM p""".stripMargin))

  private val e14 = Q(
    "e14_gopher_rules",
    // The full Gopher quality-filter ruleset (Rae et al. 2021, table A1) as
    // one codegen'd projection — each rule a column, plus the conjunction.
    // One scan, no shuffle: the 100 TB shape of a corpus-wide quality pass.
    // Word/line splits and every ratio are mirrored operation-for-operation
    // in the DuckDB oracle; ratios rounded to 4dp on both sides.
    (s, dir) => {
      val toks = expr("filter(split(trim(text), '\\\\s+'), x -> x != '')")
      val lines = expr("filter(split(text, '\\n'), x -> trim(x) != '')")
      val d = Tables.documents(s, dir)
        .withColumn("t", toks).withColumn("ls", lines)
      val wordCnt = size(col("t")).cast("long")
      val meanLen = expr("aggregate(t, 0L, (a, x) -> a + length(x))")
        .cast("double") / wordCnt
      val symbolRatio = size(expr("regexp_extract_all(text, '#|\\\\.\\\\.\\\\.', 0)"))
        .cast("double") / wordCnt
      val bulletRatio = size(expr("filter(ls, x -> x rlike '^\\\\s*[-*]')"))
        .cast("double") / size(col("ls"))
      val ellipsisRatio = size(expr("filter(ls, x -> x rlike '\\\\.\\\\.\\\\.$')"))
        .cast("double") / size(col("ls"))
      val alphaRatio = size(expr("filter(t, x -> x rlike '[A-Za-z]')"))
        .cast("double") / wordCnt
      val stopCnt = size(expr(
        "filter(t, x -> array_contains(array('the','be','to','of','and','that','have','with'), lower(x)))"))
        .cast("long")
      d.select(
        col("doc_id"),
        wordCnt.as("word_cnt"),
        round(meanLen, 4).as("mean_word_len"),
        round(symbolRatio, 4).as("symbol_ratio"),
        round(bulletRatio, 4).as("bullet_ratio"),
        round(ellipsisRatio, 4).as("ellipsis_ratio"),
        round(alphaRatio, 4).as("alpha_ratio"),
        stopCnt.as("stop_cnt"),
        (wordCnt.between(50, 100000) && meanLen.between(3, 10) &&
          symbolRatio < 0.1 && bulletRatio < 0.9 && ellipsisRatio < 0.3 &&
          alphaRatio > 0.8 && stopCnt >= 2).cast("int").as("passes"))
    },
    Some("""WITH d AS (
      |  SELECT doc_id, text,
      |         list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                     x -> x <> '') AS t,
      |         list_filter(string_split(text, chr(10)),
      |                     x -> trim(x) <> '') AS ls
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(t) AS BIGINT) AS word_cnt,
      |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
      |      / len(t) AS mean_word_len,
      |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
      |      / len(t) AS symbol_ratio,
      |    CAST(len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*]')))
      |      AS DOUBLE) / len(ls) AS bullet_ratio,
      |    CAST(len(list_filter(ls, x -> regexp_matches(x, '\.\.\.$')))
      |      AS DOUBLE) / len(ls) AS ellipsis_ratio,
      |    CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
      |      AS DOUBLE) / len(t) AS alpha_ratio,
      |    CAST(len(list_filter(t, x -> lower(x) IN
      |      ('the','be','to','of','and','that','have','with'))) AS BIGINT)
      |      AS stop_cnt
      |  FROM d)
      |SELECT doc_id, word_cnt,
      |  round(mean_word_len, 4) AS mean_word_len,
      |  round(symbol_ratio, 4) AS symbol_ratio,
      |  round(bullet_ratio, 4) AS bullet_ratio,
      |  round(ellipsis_ratio, 4) AS ellipsis_ratio,
      |  round(alpha_ratio, 4) AS alpha_ratio,
      |  stop_cnt,
      |  CAST(word_cnt BETWEEN 50 AND 100000
      |       AND mean_word_len BETWEEN 3 AND 10
      |       AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
      |       AND ellipsis_ratio < 0.3 AND alpha_ratio > 0.8
      |       AND stop_cnt >= 2 AS INT) AS passes
      |FROM m""".stripMargin))

  private val e15 = Q(
    "e15_training_pipeline",
    // The end-to-end training-corpus story, composed from proven stages:
    // clean (length floor → exact dedup → transitive near-dup CC, c10) →
    // quality gate (the two Gopher rules that discriminate on this corpus:
    // word floor + stopword floor, e14) → sequence packing (e13). A user of
    // the engine runs exactly this chain; the oracle is the same chain in
    // SQL — c10's recursive closure feeding the gopher predicate feeding
    // the pack prefix sum. Plan shape: the c10 stages dominate; the gate is
    // a stateless filter and packing adds the two-level cumsum only.
    (s, dir) => {
      val cleanedIds = Dedup.cleanCorpusCC(corpus(s, dir), "doc_id", "text")
        .select("doc_id")
      val withText = cleanedIds.join(corpus(s, dir), Seq("doc_id"))
      val toks = expr("filter(split(trim(text), '\\\\s+'), x -> x != '')")
      val stopCnt = size(expr(
        "filter(t, x -> array_contains(array('the','be','to','of','and','that','have','with'), lower(x)))"))
      val quality = withText.withColumn("t", toks)
        .filter(size(col("t")) >= 50 && stopCnt >= 2)
      operators.Chunking.pack(
        quality.select(col("doc_id"), bpeTokenCount.as("tok_count")),
        "doc_id", "tok_count", seqLen = 512, groupSize = 64)
    },
    Some(s"""WITH RECURSIVE $corpusCte,
      |longe AS (
      |  SELECT doc_id, text FROM corpus
      |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 5),
      |exd AS (
      |  SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |         count(*) AS exact_copies
      |  FROM longe GROUP BY 1),
      |kept AS (
      |  SELECT keeper_id AS doc_id, fp, exact_copies, text
      |  FROM exd JOIN longe ON doc_id = keeper_id),
      |${gramCtes("kept")},
      |inter AS (
      |  SELECT id_a, id_b, count(*) AS i FROM pair_inter GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(g) AS n FROM grams),
      |pj AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |nodes AS (SELECT id_a AS id FROM pj UNION SELECT id_b FROM pj),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pj
      |          UNION ALL SELECT id_b, id_a FROM pj),
      |reach(id, r) AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id),
      |nonreps AS (
      |  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> min(r)),
      |clean AS (
      |  SELECT k.doc_id, k.text FROM kept k
      |  WHERE k.doc_id NOT IN (SELECT doc_id FROM nonreps)),
      |gated AS (
      |  SELECT doc_id, text FROM clean
      |  WHERE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |                        x -> x <> '')) >= 50
      |    AND len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |          x -> lower(x) IN ('the','be','to','of','and','that','have','with')))
      |        >= 2),
      |t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_extract_all(text, '$BpeTokenPattern'))
      |              AS BIGINT) AS tok_count
      |  FROM gated),
      |p AS (
      |  SELECT doc_id, tok_count,
      |         CAST(COALESCE(SUM(tok_count) OVER (ORDER BY doc_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |              AS BIGINT) AS start_off
      |  FROM t WHERE tok_count > 0)
      |SELECT doc_id, tok_count, start_off,
      |       start_off // 512 AS bin_first,
      |       (start_off + tok_count - 1) // 512 AS bin_last,
      |       CAST((start_off + tok_count - 1) // 512 - start_off // 512 + 1
      |            AS INT) AS bins_spanned
      |FROM p""".stripMargin))

  private val e16 = Q(
    "e16_budget_select",
    // Token-budget data selection: admit docs in quality-rank order until
    // the budget is spent (the "keep the best N tokens" pipeline step).
    // Quality is e02's rounded score (rounding on BOTH sides pins the rank
    // order exactly); the rank-order cumsum is two-level per Selection's
    // value-range bucketing — never a corpus-wide single-partition window.
    (s, dir) => {
      val chars = length(col("text"))
      val toks = size(split(trim(col("text")), "\\s+"))
      val punct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
      val stops = size(expr(
        "regexp_extract_all(text, '\\\\b(the|a|and|of|to|in|is|it|for|on)\\\\b', 0)"))
      val punctRatio = punct.cast("double") / chars
      val stopRatio = stops.cast("double") / toks
      val scored = Tables.documents(s, dir).select(
        col("doc_id"),
        round(
          least(toks.cast("double") / 100.0, lit(1.0)) * 0.3 +
            (lit(1.0) - punctRatio) * 0.3 +
            least(stopRatio * 4.0, lit(1.0)) * 0.4, 4).as("quality"),
        bpeTokenCount.cast("long").as("tok_count"))
      operators.Selection.budgetSelect(
        scored, "doc_id", "quality", "tok_count", budget = 20000L)
    },
    Some(s"""WITH q AS (
      |  SELECT doc_id,
      |    round(
      |      least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
      |      (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text)) * 0.3 +
      |      least(CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in|is|it|for|on)\\b')) AS DOUBLE)
      |            / len(regexp_split_to_array(trim(text), '\\s+')) * 4.0, 1.0) * 0.4, 4) AS quality,
      |    CAST(len(regexp_extract_all(text, '$BpeTokenPattern')) AS BIGINT) AS tok_count
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, quality, tok_count,
      |         CAST(SUM(tok_count) OVER (ORDER BY quality DESC, doc_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS cum_tokens
      |  FROM q WHERE tok_count > 0)
      |SELECT doc_id, quality, tok_count, cum_tokens
      |FROM p WHERE cum_tokens <= 20000""".stripMargin))

  private val e17 = Q(
    "e17_nfc_normalize",
    // Unicode NFC composition as a native codegen'd expression — the
    // pipeline step that makes visually-identical decomposed/composed text
    // byte-identical BEFORE hashing/dedup. The corpus is ASCII, so each doc
    // gains a planted decomposed suffix ('cafe' + U+0301, 'n' + U+0303);
    // NFC must compose both (é, ñ), shortening the string by exactly 2
    // chars, and a second application must be a fixed point.
    (s, dir) => {
      val planted = concat(col("text"), lit(" cafe\u0301 n\u0303"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        graft.functions.nfc_normalize(planted).as("nfc_text"),
        length(planted).as("len_raw"),
        length(graft.functions.nfc_normalize(planted)).as("len_nfc"),
        (graft.functions.nfc_normalize(graft.functions.nfc_normalize(planted)) ===
          graft.functions.nfc_normalize(planted)).cast("int").as("idempotent"))
    },
    Some("""SELECT doc_id,
      |  nfc_normalize(text || ' cafe' || chr(769) || ' n' || chr(771)) AS nfc_text,
      |  CAST(length(text || ' cafe' || chr(769) || ' n' || chr(771)) AS INT) AS len_raw,
      |  CAST(length(nfc_normalize(text || ' cafe' || chr(769) || ' n' || chr(771))) AS INT) AS len_nfc,
      |  CAST(nfc_normalize(nfc_normalize(text || ' cafe' || chr(769) || ' n' || chr(771))) =
      |       nfc_normalize(text || ' cafe' || chr(769) || ' n' || chr(771)) AS INT) AS idempotent
      |FROM documents""".stripMargin))

  private val e18 = Q(
    "e18_lm_perplexity",
    // CCNet-style LM quality gate (Wenzek et al. 2020; LLaMA's pipeline):
    // score each document by the cross-entropy of its tokens under a unigram
    // LM trained on the corpus itself — high perplexity = word salad / OCR
    // noise, the classic "keep the head of the LM-score distribution"
    // filter. Scale notes on operators.TextLm.
    (s, dir) => TextLm.lmScore(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH terms AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
      |       WHERE length(term) > 0 GROUP BY 1, 2),
      |lm AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM lm)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  round(-sum(tf * ln(cnt / tot.tot)) / sum(tf), 4) AS cross_entropy,
      |  round(exp(-sum(tf * ln(cnt / tot.tot)) / sum(tf)), 2) AS ppl
      |FROM tf JOIN lm USING (term) CROSS JOIN tot
      |GROUP BY doc_id""".stripMargin))

  private val e23 = Q(
    "e23_nb_quality",
    // Model-based quality gate (the GPT-3/LLaMA-style "reference vs crawl"
    // classifier): Multinomial Naive Bayes DISTILLING a heuristic label —
    // reference class = stopword density ≥ 0.06, the e14-family signal —
    // into a token model, trained on the 90% split and scored HELD-OUT on
    // ALL docs (the classifier genuinely meets unseen terms → the Laplace
    // floor fires; and the label carries real token evidence, unlike this
    // corpus's metadata lang tag whose texts are i.i.d. token soup —
    // TextLmSpec proves held-out accuracy beats the majority baseline).
    // Exact-count training ⇒ the oracle replays the whole model (label,
    // class counts, totals, vocab, priors) and the score sum in SQL;
    // summation-order ulp drift is absorbed by the 4-dp round, the e18
    // discipline. Scale notes on operators.TextLm.nbQualityScore.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val sw = docs.select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id")
        .agg(avg(when(col("term").isin("the", "a"), 1.0).otherwise(0.0)).as("sw"))
      TextLm.nbQualityScore(docs.join(sw, "doc_id"), "doc_id", "text",
        col("sw") >= 0.06, col("doc_id") % 10 =!= 0)
    },
    Some("""WITH toks0 AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |toks AS (SELECT doc_id, term FROM toks0 WHERE length(term) > 0),
      |lbl AS (
      |  SELECT doc_id,
      |         avg(CASE WHEN term IN ('the', 'a') THEN 1.0 ELSE 0.0 END) >= 0.06
      |           AS is_pos,
      |         doc_id % 10 <> 0 AS is_train
      |  FROM toks GROUP BY doc_id),
      |tf AS (
      |  SELECT t.doc_id, l.is_pos, l.is_train, t.term, count(*) AS tf
      |  FROM toks t JOIN lbl l USING (doc_id) GROUP BY 1, 2, 3, 4),
      |cls AS (
      |  SELECT term,
      |         sum(CASE WHEN is_pos THEN tf ELSE 0 END) AS cpos,
      |         sum(CASE WHEN NOT is_pos THEN tf ELSE 0 END) AS cneg
      |  FROM tf WHERE is_train GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(cpos) AS DOUBLE) AS tpos,
      |         CAST(sum(cneg) AS DOUBLE) AS tneg,
      |         CAST(count(*) AS DOUBLE) AS v
      |  FROM cls),
      |pri AS (
      |  SELECT CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS DOUBLE) AS npos,
      |         CAST(count(*) AS DOUBLE) AS n
      |  FROM lbl WHERE is_train),
      |scored AS (
      |  SELECT tf.doc_id, sum(tf) AS n_tokens,
      |    ln((max(pri.npos) + 1) / (max(pri.n) - max(pri.npos) + 1)) +
      |      sum(tf * (ln((coalesce(cpos, 0) + 1) / (tot.tpos + tot.v))
      |              - ln((coalesce(cneg, 0) + 1) / (tot.tneg + tot.v)))) AS score
      |  FROM tf LEFT JOIN cls USING (term) CROSS JOIN tot CROSS JOIN pri
      |  GROUP BY tf.doc_id, tot.tpos, tot.tneg, tot.v)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |       round(score, 4) AS nb_score, score > 0 AS pred_pos
      |FROM scored""".stripMargin))

  private val e24 = Q(
    "e24_epoch_shuffle",
    // Deterministic epoch shuffle (operators/Selection.epochShuffle): the
    // reproducible global training-order permutation, epoch 7. The oracle
    // ranks by the identical md5 permutation globally; the Spark plan
    // reaches the same positions without a global sort via the two-level
    // (bucket-by-hash-prefix → in-bucket rank → tiny offsets broadcast)
    // scheme — a plain Window.orderBy here is exactly the single-partition
    // hazard PlanAudit flags.
    (s, dir) => operators.Selection.epochShuffle(
      Tables.documents(s, dir), "doc_id", epoch = 7),
    Some("""SELECT doc_id,
      |  row_number() OVER (
      |    ORDER BY md5('epoch7:' || CAST(doc_id AS VARCHAR)), doc_id)
      |    AS shuffle_pos
      |FROM documents""".stripMargin))

  private val e25 = Q(
    "e25_bm25_search",
    // BM25 ranked retrieval (operators/Bm25.scala) — the lexical-search
    // complement to group D's vector ANN: five keyword queries (one with a
    // repeated term — bag-of-words accumulation is part of the contract)
    // scored with Okapi BM25 + Lucene-style non-negative idf, top-10 per
    // query. Exact-count statistics ⇒ the oracle replays tf/df/dl/avgdl
    // and the scoring formula termwise; ties (exact-duplicate docs) break
    // on doc_id identically in both engines.
    (s, dir) => {
      import s.implicits._
      val qs = Seq(
        (0L, "spark join"), (1L, "window agg"), (2L, "customer data table"),
        (3L, "hash group stream"), (4L, "the a the"))
        .toDF("query_id", "qtext")
      operators.Bm25.search(Tables.documents(s, dir), qs,
        "doc_id", "text", "query_id", "qtext")
    },
    Some("""WITH q(query_id, qtext) AS (VALUES
      |    (0, 'spark join'), (1, 'window agg'), (2, 'customer data table'),
      |    (3, 'hash group stream'), (4, 'the a the')),
      |qt AS (
      |  SELECT query_id, unnest(regexp_split_to_array(trim(qtext), '\s+')) AS term
      |  FROM q),
      |toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
      |       WHERE length(term) > 0 GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    sum(ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) *
      |        tf * (1.2 + 1.0) /
      |        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
      |  FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats s
      |  GROUP BY 1, 2, s.n_docs, s.avgdl),
      |ranked AS (
      |  SELECT query_id, doc_id, score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      |       round(score, 4) AS score, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 10""".stripMargin))

  // ---------------------------------------------------------------- group F

  private val f01 = Q(
    "f01_binary_meta",
    (s, dir) =>
      // media payloads as opaque binary + typed metadata; the fake payload is
      // the utf-8 text bytes, the metadata path (length, digest) is real
      Tables.documents(s, dir).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha")),
    Some("""SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes, sha256(text) AS sha
      |FROM documents""".stripMargin))

  private val f02 = Q(
    "f02_mm_features",
    // REAL color-image decode (was the declared stub until r5): 24-bit
    // BI_RGB BMP — fixed-offset LE headers, honored pixel-data offset,
    // BOTTOM-UP padded BGR rows — synthesized per doc with closed-form
    // channel bytes; the oracle computes the per-channel means analytically
    // (means are row-order independent, so the bottom-up storage the
    // decoder must undo cannot leak into the expected values — but a missed
    // padding byte or BGR swap changes them).
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Multimodal.syntheticBmp(id)))
        .toDF("doc_id", "payload")
      operators.Multimodal.extractBmp(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_r", round(col("mean_r"), 4))
        .withColumn("mean_g", round(col("mean_g"), 4))
        .withColumn("mean_b", round(col("mean_b"), 4))
    },
    // max pixel count is 8*6 = 48 → bounded series + filter
    Some("""WITH px AS (
      |  SELECT d.doc_id, s.i
      |  FROM documents d, generate_series(0, 47) s(i)
      |  WHERE s.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4))
      |SELECT doc_id,
      |  CAST(4 + doc_id % 5 AS INT) AS width,
      |  CAST(3 + doc_id % 4 AS INT) AS height,
      |  CAST((4 + doc_id % 5) * (3 + doc_id % 4) AS INT) AS n_pixels,
      |  round(avg(CAST((doc_id * 13 + i * 2) % 256 AS DOUBLE)), 4) AS mean_r,
      |  round(avg(CAST((doc_id * 11 + i * 5) % 256 AS DOUBLE)), 4) AS mean_g,
      |  round(avg(CAST((doc_id * 7 + i * 3) % 256 AS DOUBLE)), 4) AS mean_b
      |FROM px GROUP BY doc_id""".stripMargin))

  private val f03 = Q(
    "f03_pgm_decode",
    // REAL binary image decode (PGM P5 — pure bytes, no codec library),
    // not the f02 stub: payloads are synthesized per doc with closed-form
    // dimensions/pixels, the executor-side parser reads the actual header
    // and pixel plane, and the oracle computes the same statistics
    // ANALYTICALLY — a mis-parsed byte cannot hash-match.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Multimodal.syntheticPgm(id)))
        .toDF("doc_id", "payload")
      operators.Multimodal.extractPgm(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_gray", round(col("mean_gray"), 4))
    },
    // max pixel count is 16*14 = 224, so a bounded series + filter replaces
    // the (unsupported) correlated generate_series
    Some("""WITH px AS (
      |  SELECT d.doc_id, s.i
      |  FROM documents d, generate_series(0, 223) s(i)
      |  WHERE s.i < (8 + d.doc_id % 9) * (8 + d.doc_id % 7))
      |SELECT doc_id,
      |  CAST(8 + doc_id % 9 AS INT) AS width,
      |  CAST(8 + doc_id % 7 AS INT) AS height,
      |  CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS INT) AS n_pixels,
      |  round(avg(CAST((doc_id * 31 + i * 7) % 256 AS DOUBLE)), 4) AS mean_gray
      |FROM px GROUP BY doc_id""".stripMargin))

  private val e21 = Q(
    "e21_bigram_backoff",
    // Context-sensitive LM gate: bigram Stupid Backoff (Brants 2007),
    // trained on 90% of docs and scoring ALL docs held-out (the CCNet
    // setup — backoff genuinely fires on unseen bigrams). Scale notes on
    // operators.TextLm.bigramScore.
    (s, dir) => TextLm.bigramScore(Tables.documents(s, dir), "doc_id", "text",
      col("doc_id") % 10 =!= 0),
    Some("""WITH toks0 AS (
      |  SELECT doc_id, doc_id % 10 <> 0 AS is_train,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
      |         unnest(range(1, len(regexp_split_to_array(trim(text), '\s+')) + 1)) AS pos
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, is_train, term, pos,
      |         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM toks0 WHERE length(term) > 0),
      |cnt1 AS (SELECT term, count(*) AS cnt1 FROM toks WHERE is_train GROUP BY 1),
      |cnt2 AS (SELECT prev, term, count(*) AS cnt2 FROM toks
      |         WHERE is_train AND prev IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(cnt1) AS DOUBLE) AS tot FROM cnt1),
      |scored AS (
      |  SELECT t.doc_id,
      |    CASE WHEN t.prev IS NULL THEN coalesce(c1.cnt1, 0.5) / tot.tot
      |         WHEN c2.cnt2 IS NOT NULL THEN CAST(c2.cnt2 AS DOUBLE) / cx.cnt1
      |         ELSE 0.4 * coalesce(c1.cnt1, 0.5) / tot.tot END AS p,
      |    CASE WHEN t.prev IS NOT NULL AND c2.cnt2 IS NULL
      |         THEN 1.0 ELSE 0.0 END AS bo
      |  FROM toks t
      |  LEFT JOIN cnt1 c1 ON c1.term = t.term
      |  LEFT JOIN cnt2 c2 ON c2.prev = t.prev AND c2.term = t.term
      |  LEFT JOIN cnt1 cx ON cx.term = t.prev
      |  CROSS JOIN tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  round(-avg(ln(p)), 4) AS ce_bigram,
      |  round(avg(bo), 4) AS backoff_rate
      |FROM scored GROUP BY doc_id""".stripMargin))

  private val e19 = Q(
    "e19_bpe_learn",
    // Distributed BPE vocabulary learning (the tokenizer-training workload;
    // scale analysis on operators.Bpe): 20 merges over the corpus's word-
    // frequency table. Not SQL-expressible (each round re-tokenizes with the
    // previous round's merge) → rows-only gate; the full merge list is
    // proven equal to an independent sequential reference implementation in
    // BpeSpec, and the first merge decision has the e20 hash oracle.
    (s, dir) => Bpe.learnMerges(s, Tables.documents(s, dir), "text", 20),
    None)

  private val e22 = Q(
    "e22_repeated_ngrams",
    // Cross-document repeated-substring detection (Lee et al. 2022
    // "Deduplicating Training Data Makes LMs Better", the ExactSubstr
    // idea at gram granularity; the sub-line sibling of c11's line dedup):
    // 8-token sliding grams, grams occurring ≥2× across the corpus are
    // boilerplate, docs are scored by their boilerplate-gram share and
    // kept below 50%. Planted exact duplicates guarantee repeated grams.
    // Scale shape: one explode → grams reduced to xxhash64 IMMEDIATELY (the
    // count Exchange and the repeated-subset join ship fixed 8-byte keys,
    // not ~50-byte gram strings — measured 2.1× end-to-end at the 100×
    // textq probe, 47.9 s → 23.2 s) → gram-keyed count with map-side combine → left join
    // against the REPEATED subset only (build side bounded by
    // grams/minRep) → per-doc agg; level-0 (short) docs restored by a
    // doc-keyed left join. Hash-key counting admits 64-bit collisions
    // (~n²/2⁶⁵: ~3·10⁴ mislabeled grams per 10¹² — immaterial for a
    // boilerplate SHARE); the DuckDB oracle joins on the gram STRING, so
    // the hash-pass at both SFs also certifies zero collisions there.
    (s, dir) => {
      val c = corpus(s, dir)
      val toks = c.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      val grams = toks.select(col("doc_id"),
        explode(when(size(col("t")) >= 8,
          expr("transform(sequence(1, size(t) - 7), i -> xxhash64(concat_ws(' ', slice(t, i, 8))))"))
          .otherwise(array())).as("g"))
      val heavy = grams.groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
      val flagged = grams.join(heavy, Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("c").isNotNull, 1).otherwise(0)).as("n_repeated"))
      val ratio = col("n_repeated").cast("double") / col("n_grams")
      c.select("doc_id").distinct()
        .join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
          round(coalesce(ratio, lit(0.0)), 4).as("repeated_ratio"),
          when(col("n_grams").isNull || ratio < 0.5, 1).otherwise(0)
            .cast("int").as("keep"))
    },
    Some(s"""WITH $corpusCte,
      |toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM corpus),
      |gi AS (
      |  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1))) AS i FROM toks),
      |grams AS (
      |  SELECT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS g FROM gi),
      |heavy AS (SELECT g, count(*) AS c FROM grams GROUP BY 1 HAVING count(*) >= 2),
      |flagged AS (
      |  SELECT grams.doc_id, count(*) AS n_grams,
      |         count(heavy.g) AS n_repeated
      |  FROM grams LEFT JOIN heavy USING (g) GROUP BY 1)
      |SELECT d.doc_id,
      |       coalesce(n_grams, 0) AS n_grams,
      |       coalesce(n_repeated, 0) AS n_repeated,
      |       round(coalesce(CAST(n_repeated AS DOUBLE) / n_grams, 0), 4) AS repeated_ratio,
      |       CAST(CASE WHEN n_grams IS NULL
      |                 OR CAST(n_repeated AS DOUBLE) / n_grams < 0.5
      |            THEN 1 ELSE 0 END AS INT) AS keep
      |FROM (SELECT DISTINCT doc_id FROM corpus) d
      |LEFT JOIN flagged USING (doc_id)""".stripMargin))

  private val e20 = Q(
    "e20_bpe_first_merge",
    // Known-answer companion for e19 (the d05 pattern): the FIRST merge is
    // pure adjacent-pair counting over (chars + </w>) symbolized words —
    // SQL-expressible, so the decision that seeds the whole learning loop
    // is hash-checked: argmax pair by (freq desc, left, right).
    (s, dir) => Bpe.learnMerges(s, Tables.documents(s, dir), "text", 1),
    // corpus max word length is 8; the bounded series (≤31) replaces the
    // unsupported correlated generate_series
    Some("""WITH words AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |wf AS (SELECT w, count(*) AS freq FROM words
      |       WHERE length(w) > 0 GROUP BY 1),
      |pairs AS (
      |  SELECT substring(w, s.i, 1) AS "left",
      |         substring(w, s.i + 1, 1) AS "right", freq
      |  FROM wf, generate_series(1, 31) s(i) WHERE s.i < length(w)
      |  UNION ALL
      |  SELECT substring(w, length(w), 1) AS "left", '</w>' AS "right", freq
      |  FROM wf),
      |pc AS (SELECT "left", "right", sum(freq) AS freq FROM pairs GROUP BY 1, 2)
      |SELECT CAST(1 AS INT) AS rank, "left", "right",
      |       "left" || "right" AS merged, CAST(freq AS BIGINT) AS freq
      |FROM pc ORDER BY freq DESC, "left", "right" LIMIT 1""".stripMargin))

  private val e26 = Q(
    "e26_bpe_encode",
    // Corpus tokenization with a corpus-learned BPE vocabulary (the
    // production tokenizer pass: learn once, broadcast the KB-sized merge
    // list, encode every doc executor-side — operators.Bpe.encodeCorpus).
    // Per-doc (n_words, n_tokens, fertility = tokens/word): fertility is
    // THE tokenizer-quality metric a data pipeline tracks per source.
    // Not SQL-expressible under learned merges (each of the 20 merges
    // depends on the previous round's re-tokenization) → rows-only gate;
    // the e27 companion hash-checks the identical encode path under a
    // fixed merge list, and BpeSpec proves learn() against a sequential
    // reference implementation.
    (s, dir) => Bpe.encodeCorpus(s, Tables.documents(s, dir), "text",
      "doc_id", Bpe.learn(s, Tables.documents(s, dir), "text", 20)),
    None)

  private val e27 = Q(
    "e27_bpe_encode_known_merges",
    // Known-answer companion for e26 (the e20/d05 pattern): the SAME
    // encodeCorpus path — broadcast merges, mapPartitions greedy encode,
    // fertility arithmetic — under a FIXED two-merge vocabulary
    // (t,h)→th then (th,e)→the, chosen so the SQL mirror is exact:
    // with left ≠ right, every "th" substring fuses (greedy L2R cannot
    // skip one — no merge consumes 't' as a right symbol), and th+e
    // adjacencies are exactly the "the" substrings, so per-word tokens =
    // codepoints + 1 (</w>) − #"th" − #"the", each count a replace-length
    // difference. Rank order matters (merge 2's left IS merge 1's output),
    // so this also pins the in-order application e26 relies on.
    (s, dir) => Bpe.encodeCorpus(s, Tables.documents(s, dir), "text",
      "doc_id", Seq(Bpe.Merge(1, "t", "h", "th", 0L),
        Bpe.Merge(2, "th", "e", "the", 0L))),
    Some("""WITH words AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |wt AS (
      |  SELECT doc_id,
      |         length(w) + 1
      |           - (length(w) - length(replace(w, 'th', ''))) // 2
      |           - (length(w) - length(replace(w, 'the', ''))) // 3 AS toks
      |  FROM words WHERE length(w) > 0),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_words, sum(toks) AS n_tokens
      |  FROM wt GROUP BY 1)
      |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
      |       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
      |       round(coalesce(CAST(n_tokens AS DOUBLE) / n_words, 0), 4) AS fertility
      |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin))

  private val e28 = Q(
    "e28_warc_ingest",
    // WARC/WET ingestion (sources/Warc.scala) — the Common-Crawl wire
    // format: documents packed 4-per-container into synthetic WET
    // containers (container id mod 3 picks plain-concatenated /
    // per-record gzip members / zstd frames — all three parser paths
    // live every run; the encoding is invisible in the output), one
    // container in 7 truncated mid-record, then extracted back through the
    // mapPartitions parse seam. A container that is malformed ANYWHERE
    // dead-letters whole, so the oracle is exactly the docs outside the
    // corrupted containers, with uri/type/octet-length/md5 recomputed from
    // the corpus — a mis-framed Content-Length or a silently-partial parse
    // cannot hash-match.
    (s, dir) => {
      import s.implicits._
      val containers = Tables.documents(s, dir)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .groupByKey(_._1 / 4) // ≤4 docs per group, bounded by construction
        .mapGroups { (cid, it) =>
          val bytes = sources.Warc.syntheticContainer(cid, it.toSeq)
          (cid, if (cid % 7 == 3) bytes.dropRight(9) else bytes)
        }
        .toDF("container_id", "payload")
      sources.Warc.extractWet(s, containers, "container_id", "payload").toDF()
    },
    Some("""SELECT doc_id,
      |       'https://example.org/doc/' || doc_id AS target_uri,
      |       'conversion' AS warc_type,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
      |       md5(text) AS text_md5
      |FROM documents
      |WHERE (doc_id // 4) % 7 <> 3""".stripMargin))

  private val e29 = Q(
    "e29_hash_split",
    // Deterministic train/val/test assignment — the split step every
    // training-data pipeline runs before materializing shards. Membership is
    // a pure function of the stable doc id (first hex nibble of
    // md5(doc_id): 12/16 train, 2/16 val, 2/16 test), so re-running over a
    // grown corpus never moves an old document between splits (the property
    // random() splits lack), and the manifest is embarrassingly parallel —
    // one map + one partial-aggregated groupBy, no row ever leaves its scan
    // partition before the combine. Shares are exact integer ratios per
    // source, divided once as doubles.
    (s, dir) => {
      val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
      val w = Window.partitionBy("source")
      Tables.documents(s, dir)
        .withColumn("split",
          when(nib.isin("c", "d"), "val")
            .when(nib.isin("e", "f"), "test")
            .otherwise("train"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .withColumn("doc_share",
          round(col("n_docs").cast("double") / sum("n_docs").over(w), 4))
    },
    Some("""WITH tagged AS (
      |  SELECT source, n_chars,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
      |                THEN 'val'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f')
      |                THEN 'test'
      |              ELSE 'train' END AS split
      |  FROM documents),
      |cells AS (
      |  SELECT source, split, count(*) AS n_docs,
      |         CAST(sum(n_chars) AS BIGINT) AS total_chars
      |  FROM tagged GROUP BY 1, 2)
      |SELECT source, split, n_docs, total_chars,
      |       round(CAST(n_docs AS DOUBLE)
      |             / sum(n_docs) OVER (PARTITION BY source), 4) AS doc_share
      |FROM cells""".stripMargin))

  private val f04 = Q(
    "f04_wav_decode",
    // REAL audio decode through the same seam as f03's image decode: RIFF/
    // WAV is a chunked little-endian container (vs PGM's ASCII header), so
    // this exercises the other half of binary wire parsing — u16/u32le
    // fields, chunk walking, word alignment. Payloads are synthesized with
    // closed-form sample counts/rates/samples; the oracle computes the
    // decoded stats ANALYTICALLY, so a mis-read endian field or chunk
    // offset cannot hash-match.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Multimodal.syntheticWav(id)))
        .toDF("doc_id", "payload")
      operators.Multimodal.extractWav(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("duration_ms", round(col("duration_ms"), 4))
        .withColumn("mean_amp", round(col("mean_amp"), 4))
    },
    // max sample count is 64 + 128 = 192, so a bounded series + filter
    // replaces the (unsupported) correlated generate_series
    Some("""WITH px AS (
      |  SELECT d.doc_id, s.i
      |  FROM documents d, generate_series(0, 192) s(i)
      |  WHERE s.i < 64 + d.doc_id % 129)
      |SELECT doc_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(64 + doc_id % 129 AS INT) AS n_samples,
      |  round((64 + doc_id % 129) * 1000.0 / (8000 + (doc_id % 4) * 4000), 4) AS duration_ms,
      |  round(avg(CAST((doc_id * 13 + i * 11) % 256 AS DOUBLE)), 4) AS mean_amp,
      |  CAST(max((doc_id * 13 + i * 11) % 256) AS INT) AS peak
      |FROM px GROUP BY doc_id""".stripMargin))

  private val f05 = Q(
    "f05_frame_sample",
    // REAL frame-sampling decode of a multi-frame (video-like) container:
    // every 3rd frame is pixel-decoded, the rest are header-parsed and
    // SEEKED over — the capability a video pipeline needs (sample, don't
    // decode the stream). Frame count/dims/pixels are closed-form, so the
    // oracle computes the sampled frames' stats analytically: a wrong
    // stride, mis-seek, or off-by-one frame boundary cannot hash-match.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Multimodal.syntheticVideo(id)))
        .toDF("doc_id", "payload")
      operators.Multimodal.extractVideo(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_gray", round(col("mean_gray"), 4))
    },
    // frames ≤ 6, pixels/frame ≤ 10·8 = 80: bounded series replace the
    // unsupported correlated generate_series
    Some("""WITH px AS (
      |  SELECT d.doc_id, f.f, p.p
      |  FROM documents d, generate_series(0, 5) f(f), generate_series(0, 79) p(p)
      |  WHERE f.f < 2 + d.doc_id % 5 AND f.f % 3 = 0
      |    AND p.p < (6 + (d.doc_id + f.f) % 5) * (6 + (d.doc_id + f.f) % 3))
      |SELECT doc_id,
      |  CAST(2 + doc_id % 5 AS INT) AS n_frames,
      |  CAST(count(DISTINCT f) AS INT) AS n_sampled,
      |  CAST(count(*) AS BIGINT) AS sampled_pixels,
      |  round(avg(CAST((doc_id * 7 + f * 13 + p * 3) % 256 AS DOUBLE)), 4) AS mean_gray
      |FROM px GROUP BY doc_id""".stripMargin))

  private val f06 = Q(
    "f06_resize",
    // REAL image resize (nearest neighbor, 4×4 thumbnail) over the f03 PGM
    // payloads: output pixel (ox,oy) samples source (⌊ox·w/4⌋, ⌊oy·h/4⌋),
    // so every resized pixel is closed-form and the checksum pins the full
    // sampling grid — one mis-mapped index cannot hash-match.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Multimodal.syntheticPgm(id)))
        .toDF("doc_id", "payload")
      operators.Multimodal.extractResized(s, withPayload, "doc_id", "payload", 4, 4)
        .toDF()
        .withColumn("mean_resized", round(col("mean_resized"), 4))
    },
    Some("""WITH px AS (
      |  SELECT d.doc_id, ox.i AS ox, oy.i AS oy,
      |         8 + d.doc_id % 9 AS w, 8 + d.doc_id % 7 AS h
      |  FROM documents d, generate_series(0, 3) ox(i), generate_series(0, 3) oy(i)),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 31 + (CAST(floor(oy * h / 4.0) AS BIGINT) * w
      |                    + CAST(floor(ox * w / 4.0) AS BIGINT)) * 7) % 256 AS val
      |  FROM px)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
      |  round(avg(CAST(val AS DOUBLE)), 4) AS mean_resized,
      |  CAST(sum(val) AS BIGINT) AS checksum
      |FROM v GROUP BY doc_id, w, h""".stripMargin))

  private val f07 = Q(
    "f07_jpeg_decode",
    // REAL baseline JPEG/JFIF decode (operators/Jpeg.scala) — the dominant
    // real-world image format, previously the one declared codec-library
    // seam. The payloads are block-constant 8×8 images: AC energy is
    // exactly zero and DC is integer, so with the all-ones quantization
    // table the ENTROPY-CODED LOSSY pipeline (markers → Huffman → byte
    // unstuffing → RSTn restarts → dequantize → IDCT → crop) reconstructs
    // every pixel exactly and the oracle computes the decoded statistics
    // ANALYTICALLY. The general lossy path is certified differentially
    // against the JDK's independent ImageIO decoder in JpegSpec.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Jpeg.syntheticJpeg(id)))
        .toDF("doc_id", "payload")
      operators.Jpeg.extractJpeg(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_luma", round(col("mean_luma"), 4))
    },
    // max pixel count is 16*12 = 192 → bounded series + filter; pixel value
    // depends only on the containing 8×8 block's coordinates
    Some("""WITH px AS (
      |  SELECT d.doc_id,
      |         s.i % (9 + d.doc_id % 8) AS x,
      |         s.i // (9 + d.doc_id % 8) AS y
      |  FROM documents d, generate_series(0, 191) s(i)
      |  WHERE s.i < (9 + d.doc_id % 8) * (8 + d.doc_id % 5))
      |SELECT doc_id,
      |  CAST(9 + doc_id % 8 AS INT) AS width,
      |  CAST(8 + doc_id % 5 AS INT) AS height,
      |  CAST((9 + doc_id % 8) * (8 + doc_id % 5) AS INT) AS n_pixels,
      |  round(avg(CAST((doc_id * 31 + (x // 8) * 17 + (y // 8) * 29) % 256 AS DOUBLE)), 4)
      |    AS mean_luma
      |FROM px GROUP BY doc_id""".stripMargin))

  private val f08 = Q(
    "f08_png_decode",
    // REAL PNG decode (operators/Png.scala) — the compressed-lossless
    // family: chunk walk with CRC-32 gates, JDK-zlib inflate, and
    // sequential un-application of the five scanline predictors
    // (None/Sub/Up/Average/Paeth; the filter type CYCLES per doc so all
    // five are live here, not just in specs). Lossless ⇒ the oracle pins
    // FULL per-pixel variation: every channel byte is closed-form in
    // (doc_id, index) and the checksum sums all of them — one mis-predicted
    // byte anywhere shifts it. ImageIO differentials (both directions,
    // exact) in PngSpec.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Png.syntheticPng(id)))
        .toDF("doc_id", "payload")
      operators.Png.extractPng(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_r", round(col("mean_r"), 4))
        .withColumn("mean_g", round(col("mean_g"), 4))
        .withColumn("mean_b", round(col("mean_b"), 4))
    },
    // max interleaved byte count is 10*8*3 = 240 → bounded series + filter
    Some("""WITH bytes AS (
      |  SELECT d.doc_id, s.i,
      |         CAST((d.doc_id * 37 + s.i * 11) % 256 AS DOUBLE) AS v
      |  FROM documents d, generate_series(0, 239) s(i)
      |  WHERE s.i < (5 + d.doc_id % 6) * (4 + d.doc_id % 5) * 3)
      |SELECT doc_id,
      |  CAST(5 + doc_id % 6 AS INT) AS width,
      |  CAST(4 + doc_id % 5 AS INT) AS height,
      |  CAST((5 + doc_id % 6) * (4 + doc_id % 5) AS INT) AS n_pixels,
      |  round(avg(CASE WHEN i % 3 = 0 THEN v END), 4) AS mean_r,
      |  round(avg(CASE WHEN i % 3 = 1 THEN v END), 4) AS mean_g,
      |  round(avg(CASE WHEN i % 3 = 2 THEN v END), 4) AS mean_b,
      |  CAST(sum(v) AS BIGINT) AS checksum
      |FROM bytes GROUP BY doc_id""".stripMargin))

  private val f09 = Q(
    "f09_flac_decode",
    // REAL FLAC decode (operators/Flac.scala) — compressed-lossless AUDIO,
    // the format speech corpora actually ship: bit-packed frame headers,
    // CRC-8/CRC-16 gates (bit flips reject, never decode to garbage),
    // UTF-8-coded frame indices, fixed + LPC linear predictors, Rice-coded
    // residuals. The synthetic frame strategy cycles CONSTANT / FIXED /
    // VERBATIM / LPC so every subframe decoder is live here. Lossless ⇒
    // the oracle pins every decoded sample: closed-form amplitude per
    // (doc_id, i), position-weighted checksum, extrema.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Flac.syntheticFlac(id)))
        .toDF("doc_id", "payload")
      operators.Flac.extractFlac(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_amp", round(col("mean_amp"), 4))
    },
    // max sample count is 1200 → bounded series + filter; the flat-stretch
    // predicate mirrors syntheticFlac's (both args non-negative, so % agrees)
    Some("""WITH px AS (
      |  SELECT d.doc_id, s.i,
      |    CASE WHEN ((s.i // 128) + d.doc_id) % 4 = 0
      |         THEN (d.doc_id * 31) % 1024 - 512
      |         ELSE (d.doc_id * 7 + s.i * 13) % 2048 - 1024 END AS v
      |  FROM documents d, generate_series(0, 1199) s(i)
      |  WHERE s.i < 600 + (d.doc_id % 4) * 200)
      |SELECT doc_id,
      |  CAST(16000 AS INT) AS sample_rate,
      |  CAST(600 + (doc_id % 4) * 200 AS INT) AS n_samples,
      |  round(avg(CAST(v AS DOUBLE)), 4) AS mean_amp,
      |  CAST(min(v) AS INT) AS min_s,
      |  CAST(max(v) AS INT) AS max_s,
      |  CAST(sum(v * (i + 1)) AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id""".stripMargin))

  private val f10 = Q(
    "f10_gif_decode",
    // REAL GIF decode (operators/Gif.scala) — palette-indexed LZW, the
    // classic animated-image wire: little-endian descriptors, global color
    // table, extension sub-block walks, 4-pass interlace (alternating per
    // frame so both row orders are live), and GIF's LZW with LSB-first
    // codes, width growth across two bumps, clear/EOI. No CRC in the
    // format ⇒ all gates structural. Per-FRAME rows (the multi-frame
    // analogue of f08): every palette index and palette entry is
    // closed-form in (doc_id, frame, pixel), and the checksum sums every
    // resolved channel byte — a mis-grown dictionary or swapped interlace
    // pass cannot hash-match. ImageIO differentials both directions in
    // GifSpec pin the LZW width-lag convention against the JDK's codec.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      import s.implicits._
      val withPayload = docs.select(col("doc_id")).as[Long]
        .map(id => (id, operators.Gif.syntheticGif(id)))
        .toDF("doc_id", "payload")
      operators.Gif.extractGif(s, withPayload, "doc_id", "payload")
        .toDF()
        .withColumn("mean_r", round(col("mean_r"), 4))
        .withColumn("mean_g", round(col("mean_g"), 4))
        .withColumn("mean_b", round(col("mean_b"), 4))
    },
    // frames ≤ 3, pixels/frame ≤ 24·18 = 432 → bounded series + filters
    Some("""WITH px AS (
      |  SELECT d.doc_id, f.f, p.i,
      |         (d.doc_id * 13 + f.f * 7 + p.i * 5) % 64 AS idx
      |  FROM documents d, generate_series(0, 2) f(f), generate_series(0, 431) p(i)
      |  WHERE f.f < 1 + d.doc_id % 3
      |    AND p.i < (16 + (d.doc_id + f.f) % 9) * (12 + (d.doc_id + f.f) % 7)),
      |ch AS (
      |  SELECT doc_id, f,
      |         CAST((doc_id * 3 + idx * 17) % 256 AS DOUBLE) AS r,
      |         CAST((doc_id * 5 + idx * 23) % 256 AS DOUBLE) AS g,
      |         CAST((doc_id * 7 + idx * 29) % 256 AS DOUBLE) AS b
      |  FROM px)
      |SELECT doc_id,
      |  CAST(f AS INT) AS frame_idx,
      |  CAST(16 + (doc_id + f) % 9 AS INT) AS width,
      |  CAST(12 + (doc_id + f) % 7 AS INT) AS height,
      |  CAST((16 + (doc_id + f) % 9) * (12 + (doc_id + f) % 7) AS INT) AS n_pixels,
      |  round(avg(r), 4) AS mean_r,
      |  round(avg(g), 4) AS mean_g,
      |  round(avg(b), 4) AS mean_b,
      |  CAST(sum(r + g + b) AS BIGINT) AS checksum
      |FROM ch GROUP BY doc_id, f""".stripMargin))

  /** f11/f13's planted media corpus (originals + exact twins %20==0 +
    * single-pixel perturbations %20==10 + truncated dead-letters %20==15)
    * hashed and COLLAPSED: one (keeper, dhash, n_copies) row per distinct
    * perceptual hash.
    */
  private def imageHashGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val orig = operators.Multimodal.syntheticPgm(id)
        val twin = if (id % 20 == 0) Seq((id + 100000, orig)) else Seq.empty
        val pert = if (id % 20 == 10) {
          val p = orig.clone()
          val plane = p.length - ((8 + id % 9) * (8 + id % 7)).toInt
          p(plane) = (((p(plane) & 0xff) + 16) % 256).toByte
          Seq((id + 200000, p))
        } else Seq.empty
        val dead = if (id % 20 == 15) Seq((id + 300000, orig.take(5))) else Seq.empty
        Seq((id, orig)) ++ twin ++ pert ++ dead
      }.toDF("row_id", "payload")
    operators.Multimodal.extractDhash(s, rows, "row_id", "payload")
      .groupBy("dhash")
      .agg(min("row_id").as("keeper"), count(lit(1)).as("n_copies"))
  }

  /** Banded hamming-≤2 pairs over the DISTINCT hashes (the f11 body). */
  private def imageDhashPairs(groups: DataFrame): DataFrame = {
    val bands = groups
      .select(col("keeper"), col("dhash"), col("n_copies"),
        explode(expr("sequence(0, 3)")).as("k"))
      .withColumn("key", expr("shiftright(dhash, k * 16) & 65535"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.key") === col("b.key") &&
          col("a.keeper") < col("b.keeper"))
      .select(col("a.keeper").as("id_a"), col("b.keeper").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"),
        col("a.n_copies").as("copies_a"), col("b.n_copies").as("copies_b"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
      .filter(col("hamming") <= 2)
      .select("id_a", "id_b", "hamming", "copies_a", "copies_b")
  }

  private val f11 = Q(
    "f11_image_dhash",
    // Perceptual image dedup — the IMAGE edition of the near-dup family:
    // dHash (9×8 nearest-sampled gradient signs, 64 bits) computed by REAL
    // decode over the PGM payloads (Multimodal.dhashPgm behind the same
    // mapPartitions seam), then the c02 banding discipline on the hash
    // (4×16-bit bands, equi-join, never all-pairs; hamming ≤ 1 ⇒ ≥3 bands
    // collide ⇒ recall 1). Corpus plants exact twins (%20==0 — same hash,
    // collapsed), single-pixel +16 perturbations (%20==10 — the
    // gradient-sign bits can move by at most 2), and truncated payloads
    // (%20==15 — dead-letter, must not reach the pair set). SCALE
    // DISCIPLINE: exact duplicates collapse FIRST (one keeper + copy count
    // per hash — the c01 move), and the banded pair search runs over
    // DISTINCT hashes only — identical-hash cliques are the degenerate
    // case that makes naive hash-pair joins quadratic (measured: 11k pairs
    // from 550 rows pre-collapse on this corpus, O(clique²) growth), while
    // distinct-hash pairs grow with data DIVERSITY, not volume. The oracle
    // computes every sampled pixel, gradient bit, keeper, band key, and
    // hamming distance ANALYTICALLY from the closed-form plane.
    (s, dir) => imageDhashPairs(imageHashGroups(s, dir)),
    // the dHash replay: w=8+d%9, h=8+d%7, pixel(p)=(d*31+p*7)%256 (+16 on
    // plane byte 0 for the perturbed rows), sample p=(oy*h//8)*w+(ox*w//9),
    // bit(oy*8+ox)=g(ox)<g(ox+1); hugeint bit sum → two's-complement BIGINT
    Some("""WITH rws AS (
      |  SELECT doc_id AS row_id, doc_id AS d, FALSE AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id, FALSE FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, doc_id, TRUE FROM documents WHERE doc_id % 20 = 10),
      |grid AS (
      |  SELECT row_id, d, pert, oy.i AS oy, ox.i AS ox,
      |         ((oy.i * (8 + d % 7)) // 8) * (8 + d % 9)
      |           + (ox.i * (8 + d % 9)) // 9 AS p
      |  FROM rws, generate_series(0, 7) oy(i), generate_series(0, 8) ox(i)),
      |gv AS (
      |  SELECT row_id, oy, ox,
      |         CASE WHEN pert AND p = 0 THEN ((d * 31) % 256 + 16) % 256
      |              ELSE (d * 31 + p * 7) % 256 END AS g
      |  FROM grid),
      |bits AS (
      |  SELECT row_id, oy, ox, g,
      |         lead(g) OVER (PARTITION BY row_id, oy ORDER BY ox) AS nxt
      |  FROM gv),
      |hsum AS (
      |  SELECT row_id,
      |         sum(CASE WHEN g < nxt
      |               THEN CAST(power(2, oy * 8 + ox) AS HUGEINT)
      |               ELSE 0::HUGEINT END) AS s
      |  FROM bits WHERE ox < 8 GROUP BY row_id),
      |hashes AS (
      |  SELECT row_id,
      |         CAST(CASE WHEN s >= 9223372036854775808
      |                THEN s - 18446744073709551616
      |                ELSE s END AS BIGINT) AS dhash
      |  FROM hsum),
      |grp AS (
      |  SELECT dhash, min(row_id) AS keeper, count(*) AS n_copies
      |  FROM hashes GROUP BY dhash),
      |bands AS (
      |  SELECT keeper, dhash, n_copies, k.i AS k,
      |         (dhash >> (k.i * 16)) & 65535 AS key
      |  FROM grp, generate_series(0, 3) k(i)),
      |cand AS (
      |  SELECT DISTINCT a.keeper AS id_a, b.keeper AS id_b,
      |         a.dhash AS ha, b.dhash AS hb,
      |         a.n_copies AS copies_a, b.n_copies AS copies_b
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.key = b.key AND a.keeper < b.keeper)
      |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
      |       copies_a, copies_b
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 2""".stripMargin))

  private val f12 = Q(
    "f12_audio_fingerprint",
    // Perceptual AUDIO dedup — f11's discipline over the WAV decoder: a
    // 32-bit envelope fingerprint (33 equal windows over the REAL-decoded
    // waveform, integer mean amplitude per window, gradient signs between
    // adjacent windows — Multimodal.fingerprintWav behind the same
    // mapPartitions seam), then 4×8-bit banding so hamming ≤ 1 pairs are
    // found by equi-join (≥3 bands collide). Planted exact twins (%20==0),
    // single-sample +32 perturbations (%20==10 — moves only window 0's
    // mean ⇒ at most bit 0 flips), and truncated containers (%20==15 —
    // dead-letter). Same scale discipline as f11: exact-dup collapse to
    // (keeper, n_copies) per fingerprint FIRST, banded pair search over
    // DISTINCT fingerprints only. Oracle replays every sample, window mean
    // (floor division), gradient bit, keeper, band key, and hamming.
    (s, dir) => {
      import s.implicits._
      val rows = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val orig = operators.Multimodal.syntheticWav(id)
          val twin = if (id % 20 == 0) Seq((id + 100000, orig)) else Seq.empty
          val pert = if (id % 20 == 10) {
            val p = orig.clone()
            p(44) = (((p(44) & 0xff) + 32) % 256).toByte // sample 0
            Seq((id + 200000, p))
          } else Seq.empty
          val dead = if (id % 20 == 15) Seq((id + 300000, orig.take(10))) else Seq.empty
          Seq((id, orig)) ++ twin ++ pert ++ dead
        }
      val hashes = rows.mapPartitions(_.flatMap { case (id, p) =>
          operators.Multimodal.fingerprintWav(id, p).map(h => (id, h))
        }).toDF("row_id", "fp")
      val groups = hashes.groupBy("fp")
        .agg(min("row_id").as("keeper"), count(lit(1)).as("n_copies"))
      val bands = groups
        .select(col("keeper"), col("fp"), col("n_copies"),
          explode(expr("sequence(0, 3)")).as("k"))
        .withColumn("key", expr("shiftright(fp, k * 8) & 255"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.k") === col("b.k") && col("a.key") === col("b.key") &&
            col("a.keeper") < col("b.keeper"))
        .select(col("a.keeper").as("id_a"), col("b.keeper").as("id_b"),
          col("a.fp").as("ha"), col("b.fp").as("hb"),
          col("a.n_copies").as("copies_a"), col("b.n_copies").as("copies_b"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(col("hamming") <= 2)
        .select("id_a", "id_b", "hamming", "copies_a", "copies_b")
    },
    // n = 64 + d%129 samples, sample(i) = (d*13 + i*11) % 256 (+32 on
    // sample 0 for perturbed rows), window k(i) = i*33 // n, mean = floor
    Some("""WITH rws AS (
      |  SELECT doc_id AS row_id, doc_id AS d, FALSE AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id, FALSE FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, doc_id, TRUE FROM documents WHERE doc_id % 20 = 10),
      |smp AS (
      |  SELECT row_id,
      |         CASE WHEN pert AND s.i = 0 THEN ((d * 13) % 256 + 32) % 256
      |              ELSE (d * 13 + s.i * 11) % 256 END AS v,
      |         (s.i * 33) // (64 + d % 129) AS k
      |  FROM rws, generate_series(0, 192) s(i)
      |  WHERE s.i < 64 + d % 129),
      |wm AS (
      |  SELECT row_id, k, CAST(sum(v) // count(*) AS BIGINT) AS m
      |  FROM smp GROUP BY row_id, k),
      |bits AS (
      |  SELECT row_id, k, m,
      |         lead(m) OVER (PARTITION BY row_id ORDER BY k) AS nxt
      |  FROM wm),
      |hashes AS (
      |  SELECT row_id,
      |         CAST(sum(CASE WHEN m < nxt THEN CAST(power(2, k) AS BIGINT)
      |                       ELSE 0 END) AS BIGINT) AS fp
      |  FROM bits WHERE k < 32 GROUP BY row_id),
      |grp AS (
      |  SELECT fp, min(row_id) AS keeper, count(*) AS n_copies
      |  FROM hashes GROUP BY fp),
      |bands AS (
      |  SELECT keeper, fp, n_copies, t.i AS k, (fp >> (t.i * 8)) & 255 AS key
      |  FROM grp, generate_series(0, 3) t(i)),
      |cand AS (
      |  SELECT DISTINCT a.keeper AS id_a, b.keeper AS id_b,
      |         a.fp AS ha, b.fp AS hb,
      |         a.n_copies AS copies_a, b.n_copies AS copies_b
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.key = b.key AND a.keeper < b.keeper)
      |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
      |       copies_a, copies_b
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 2""".stripMargin))

  private val f13 = Q(
    "f13_media_clusters",
    // Media near-dup CLUSTERS — f11's pair graph closed into connected
    // components (c09's alternating-star contraction, O(log²) rounds), the
    // policy-grade output a media-dedup run wants: pick one canonical image
    // per cluster, know the cluster's total copy mass. One row per distinct
    // hash that has at least one ≤2-bit neighbor: (keeper_id, rep =
    // component-min keeper, cluster_keepers = distinct hashes in the
    // component, cluster_copies = Σ n_copies — raw images the cluster
    // absorbs). The oracle replays the full chain: analytic dHash → collapse
    // → banded pairs → recursive min-label closure → cluster aggregates.
    (s, dir) => {
      val groups = imageHashGroups(s, dir)
      val pairs = imageDhashPairs(groups)
      val cc = operators.Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      val withCopies = cc.join(
        groups.select(col("keeper").as("doc_id"), col("n_copies")), "doc_id")
      val agg = withCopies.groupBy("rep")
        .agg(count(lit(1)).as("cluster_keepers"),
          sum("n_copies").as("cluster_copies"))
      withCopies.join(agg, "rep")
        .select(col("doc_id").as("keeper_id"), col("rep"),
          col("cluster_keepers"), col("cluster_copies"))
    },
    Some("""WITH RECURSIVE rws AS (
      |  SELECT doc_id AS row_id, doc_id AS d, FALSE AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id, FALSE FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, doc_id, TRUE FROM documents WHERE doc_id % 20 = 10),
      |grid AS (
      |  SELECT row_id, d, pert, oy.i AS oy, ox.i AS ox,
      |         ((oy.i * (8 + d % 7)) // 8) * (8 + d % 9)
      |           + (ox.i * (8 + d % 9)) // 9 AS p
      |  FROM rws, generate_series(0, 7) oy(i), generate_series(0, 8) ox(i)),
      |gv AS (
      |  SELECT row_id, oy, ox,
      |         CASE WHEN pert AND p = 0 THEN ((d * 31) % 256 + 16) % 256
      |              ELSE (d * 31 + p * 7) % 256 END AS g
      |  FROM grid),
      |bits AS (
      |  SELECT row_id, oy, ox, g,
      |         lead(g) OVER (PARTITION BY row_id, oy ORDER BY ox) AS nxt
      |  FROM gv),
      |hsum AS (
      |  SELECT row_id,
      |         sum(CASE WHEN g < nxt
      |               THEN CAST(power(2, oy * 8 + ox) AS HUGEINT)
      |               ELSE 0::HUGEINT END) AS s
      |  FROM bits WHERE ox < 8 GROUP BY row_id),
      |hashes AS (
      |  SELECT row_id,
      |         CAST(CASE WHEN s >= 9223372036854775808
      |                THEN s - 18446744073709551616
      |                ELSE s END AS BIGINT) AS dhash
      |  FROM hsum),
      |grp AS (
      |  SELECT dhash, min(row_id) AS keeper, count(*) AS n_copies
      |  FROM hashes GROUP BY dhash),
      |bands AS (
      |  SELECT keeper, dhash, k.i AS k, (dhash >> (k.i * 16)) & 65535 AS key
      |  FROM grp, generate_series(0, 3) k(i)),
      |pj AS (
      |  SELECT DISTINCT a.keeper AS id_a, b.keeper AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.key = b.key AND a.keeper < b.keeper
      |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 2),
      |nodes AS (SELECT id_a AS id FROM pj UNION SELECT id_b FROM pj),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pj
      |          UNION ALL SELECT id_b, id_a FROM pj),
      |reach(id, r) AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id),
      |cc AS (SELECT id AS keeper_id, min(r) AS rep FROM reach GROUP BY id),
      |wc AS (
      |  SELECT cc.keeper_id, cc.rep, g.n_copies
      |  FROM cc JOIN grp g ON g.keeper = cc.keeper_id),
      |agg AS (
      |  SELECT rep, count(*) AS cluster_keepers,
      |         CAST(sum(n_copies) AS BIGINT) AS cluster_copies
      |  FROM wc GROUP BY rep)
      |SELECT keeper_id, wc.rep, cluster_keepers, cluster_copies
      |FROM wc JOIN agg USING (rep)""".stripMargin))

  // ---------------------------------------------------------------- group G

  private val g01 = Q(
    "g01_stream_totals",
    (s, dir) => {
      // Batch run of the exact transform the streaming pipeline uses
      // (StreamingSpec drives the same functions through MemoryStream):
      // anonymize → (watermark on stream) → hourly windowed totals.
      val hl = telemetry.Observability.observedLogs(
        streaming.HttpLogPipeline.anonymize(httpLog(s, dir)))
      streaming.HttpLogPipeline.windowedTotals(
        streaming.HttpLogPipeline.withEventTimeBounds(hl))
        .select(
          col("window.start").as("ts_hour"),
          col("resource_id"), col("response_status"), col("cache_status"),
          col("remote_addr"),
          col("requests"), col("total_bytes"), col("total_time_milli"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT date_trunc('hour', ts) AS ts_hour,
      |       resource_id, response_status, cache_status,
      |       $anonV4Sql AS remote_addr,
      |       count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       CAST(sum(request_time_milli) AS BIGINT) AS total_time_milli
      |FROM http_log
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin))

  private val g02 = Q(
    "g02_stream_dedup",
    (s, dir) => {
      // at-least-once replay (20% of rows re-delivered) restored to
      // exactly-once by the shared dedup transform
      val hl = httpLog(s, dir)
        .withColumn("ts_sec", date_trunc("second", col("ts")))
        .select("log_id", "resource_id", "bytes_sent", "ts_sec")
      val replayed = hl.unionByName(hl.filter(col("log_id") % 5 === 0))
      streaming.HttpLogPipeline.dedupReplayed(replayed, Seq("log_id"))
    },
    Some(s"""${HttpLog.cte}
      |SELECT log_id, resource_id, bytes_sent, date_trunc('second', ts) AS ts_sec
      |FROM http_log""".stripMargin))

  private val g05 = Q(
    "g05_stream_topk",
    // the reference README's dashboard question ("top resources, always
    // fresh") as a continuous query: ONE watermark-bounded windowed count
    // (streaming-legal state) + a stateless k-bounded TopK selection over
    // closed windows (foreachBatch on a stream; same function here on
    // batch — parity in StreamingSpec). Never a second streaming agg, never
    // a whole-partition window sort.
    (s, dir) => streaming.HttpLogPipeline.topResources(
      streaming.HttpLogPipeline.hourlyResourceCounts(
        streaming.HttpLogPipeline.withEventTimeBounds(httpLog(s, dir)))),
    Some(s"""${HttpLog.cte},
      |hourly AS (
      |  SELECT date_trunc('hour', ts) AS ts_hour, resource_id,
      |         count(*) AS requests
      |  FROM http_log GROUP BY 1, 2),
      |ranked AS (
      |  SELECT ts_hour, resource_id, requests,
      |         row_number() OVER (PARTITION BY ts_hour
      |           ORDER BY requests DESC, resource_id) AS rn
      |  FROM hourly)
      |SELECT ts_hour, CAST(rn AS INT) AS rank, resource_id,
      |       CAST(requests AS BIGINT) AS requests
      |FROM ranked WHERE rn <= 5""".stripMargin))

  private val g06 = Q(
    "g06_stream_funnel",
    // the streaming funnel's EMISSION fold (StatefulFunnel.foldLevel — the
    // exact function flatMapGroupsWithState runs at watermark timeout),
    // oracle-gated on batch data: per-user step events through the same
    // fold, levels counted. StatefulFunnelSpec proves stream==batch through
    // MemoryStream incl. cross-batch out-of-order delivery; this query pins
    // the fold itself to the cascading-min oracle. Production path is the
    // bounded-state stream; this mapGroups twin exists for the gate.
    (s, dir) => {
      import s.implicits._
      val steps = Seq("view", "click", "purchase")
      Tables.events(s, dir)
        .select(col("user_id").cast("long").as("u"),
          unix_micros(col("ts")).as("t"), col("event_type").as("y"))
        .as[(Long, Long, String)]
        .groupByKey(_._1)
        .mapGroups { (u, it) =>
          val evs = it.collect { case (_, t, y) if steps.contains(y) => (t, y) }.toList
          (u, streaming.StatefulFunnel.foldLevel(evs, steps, 86400000000L))
        }
        .toDF("user_id", "level")
        .groupBy("level").agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH t1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
      |    AND epoch_us(e.ts) <= t1.t1 + 86400000000 GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |  FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
      |    AND epoch_us(e.ts) <= t1.t1 + 86400000000 GROUP BY 1),
      |lv AS (
      |  SELECT u.user_id,
      |    CASE WHEN t3.user_id IS NOT NULL THEN 3
      |         WHEN t2.user_id IS NOT NULL THEN 2
      |         WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
      |  FROM (SELECT DISTINCT user_id FROM events) u
      |  LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |  LEFT JOIN t3 USING (user_id))
      |SELECT CAST(level AS INT) AS level, count(*) AS n_users
      |FROM lv GROUP BY level""".stripMargin))

  private val g07 = Q(
    "g07_stream_retention",
    // the streaming retention's EMISSION fold (StatefulRetention
    // .incrementsOf — the exact increments flatMapGroupsWithState emits as
    // weeks close under the watermark), oracle-gated on batch data against
    // b39's matrix SQL: increments aggregated per (cohort, week_offset)
    // plus cohort-size shares. StatefulRetentionSpec proves stream==batch
    // through MemoryStream incl. cross-batch out-of-order delivery (the
    // week-closure argument makes the cohort final before first emission);
    // this query pins the fold itself to the oracle. Production path is
    // the bounded-state stream; this flatMapGroups twin exists for the
    // gate.
    (s, dir) => {
      import s.implicits._
      val cells = Tables.events(s, dir)
        .select(col("user_id").cast("long").as("u"), unix_millis(col("ts")).as("ms"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (u, it) =>
          streaming.StatefulRetention.incrementsOf(it.map(_._2).toSeq)
            .map { case (c, off) => (u, new java.sql.Timestamp(c), off) }
        }
        .toDF("user_id", "cohort", "week_offset")
        .groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("active_users"))
      val sizes = cells.filter(col("week_offset") === 0)
        .select(col("cohort"), col("active_users").as("cohort_size"))
      cells.join(broadcast(sizes), "cohort")
        .select(col("cohort"), col("week_offset"), col("active_users"),
          round(col("active_users").cast("double") / col("cohort_size"), 4)
            .as("retention"))
    },
    Some("""WITH weeks AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |firsts AS (SELECT user_id, min(wk) AS cohort FROM weeks GROUP BY 1),
      |cells AS (
      |  SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_offset,
      |         count(*) AS active_users
      |  FROM weeks JOIN firsts USING (user_id) GROUP BY 1, 2),
      |sizes AS (SELECT cohort, active_users AS cohort_size FROM cells
      |          WHERE week_offset = 0)
      |SELECT CAST(cohort AS TIMESTAMP) AS cohort, week_offset, active_users,
      |       round(CAST(active_users AS DOUBLE) / cohort_size, 4) AS retention
      |FROM cells JOIN sizes USING (cohort)""".stripMargin))

  private val g08 = Q(
    "g08_stream_sessionize",
    // the streaming sessionizer's EXACT fold (StatefulSessionize.sessionizeFn,
    // driven per-user through TestGroupState, trailing session closed via the
    // same hasTimedOut branch the event-time timeout takes), oracle-gated on
    // batch data against the gap-session SQL a09 also certifies. StreamingSpec
    // proves stream==batch through MemoryStream incl. watermark-timeout
    // closure and late-event backward extension; this query pins the fold
    // itself. Production path is the bounded-state stream (state O(users)).
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(col("user_id").cast("long").as("u"), unix_millis(col("ts")).as("ms"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (u, it) =>
          streaming.StatefulSessionize.sessionsOfBatch(
            u, it.map(_._2).toSeq, 30L * 60 * 1000).iterator
        }
        .toDF("user_id", "start_ms", "end_ms", "n_events", "dur_sec")
        .withColumn("n_events", col("n_events").cast("long"))
    },
    Some("""WITH marked AS (
      |  SELECT user_id, epoch_ms(ts) AS ms,
      |         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
      |              WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1
      |              ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))),
      |sess AS (
      |  SELECT user_id, ms,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
      |       count(*) AS n_events,
      |       CAST((max(ms) - min(ms)) // 1000 AS BIGINT) AS dur_sec
      |FROM sess GROUP BY user_id, sid""".stripMargin))

  private val g09 = Q(
    "g09_stream_admission",
    // the end-to-end streaming ingest verdict (streaming/Admission.scala):
    // rule quality gate → LSH near-dup screen vs the indexed corpus, one
    // row per arrival. Arrival mix covers all three paths: %10==0 re-crawls
    // (quality passes, screen flags), %10==5 machine junk (rules reject
    // before any shingling), %10∈{1,3,7} fresh content (vowel-rotated —
    // admitted). Every stage is stateless, so the batch result IS the
    // streaming result (per-batch-union parity in StreamingSpec); the
    // oracle mirrors rules exactly (integer-ratio alpha floor) and the
    // screen with exact cross gram-Jaccard (g03's argument).
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val recrawl = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" streamscreen probe suffix")).as("text"))
      val junk = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 300000).as("doc_id"),
          trim(repeat(lit("@@@ "), 20)).as("text"))
      val fresh = docs.filter(col("doc_id") % 10 === 1 ||
          col("doc_id") % 10 === 3 || col("doc_id") % 10 === 7)
        .select((col("doc_id") + 400000).as("doc_id"),
          translate(col("text"), "aeiou", "uoiea").as("text"))
      streaming.Admission.admit(
        recrawl.unionByName(junk).unionByName(fresh), docs, "doc_id", "text")
    },
    Some("""WITH incoming AS (
      |  SELECT doc_id + 200000 AS doc_id,
      |         text || ' streamscreen probe suffix' AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 300000, trim(repeat('@@@ ', 20))
      |  FROM documents WHERE doc_id % 10 = 5
      |  UNION ALL
      |  SELECT doc_id + 400000, translate(text, 'aeiou', 'uoiea')
      |  FROM documents WHERE doc_id % 10 IN (1, 3, 7)),
      |rules AS (
      |  SELECT doc_id, text,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                    x -> x <> '')) AS n_words,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                    x -> regexp_full_match(x, '[a-z]+'))) AS alpha_words
      |  FROM incoming),
      |gated AS (
      |  SELECT doc_id, text, CAST(n_words AS INT) AS n_words,
      |         (n_words >= 5 AND alpha_words * 10 >= n_words * 7) AS quality_pass
      |  FROM rules),
      |itoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM gated WHERE quality_pass
      |    AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                        x -> x <> '')) > 0),
      |igrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM itoks),
      |ctoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                        x -> x <> '')) > 0),
      |cgrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM ctoks),
      |iex AS (SELECT doc_id, unnest(g) AS gram FROM igrams),
      |cex AS (SELECT doc_id AS corpus_id, unnest(g) AS gram FROM cgrams),
      |inter AS (
      |  SELECT doc_id, corpus_id, count(*) AS i
      |  FROM iex JOIN cex USING (gram) GROUP BY 1, 2),
      |isz AS (SELECT doc_id, len(g) AS n FROM igrams),
      |csz AS (SELECT doc_id AS corpus_id, len(g) AS n FROM cgrams),
      |flagged AS (
      |  SELECT DISTINCT doc_id
      |  FROM inter JOIN isz USING (doc_id) JOIN csz USING (corpus_id)
      |  WHERE CAST(i AS DOUBLE) / (isz.n + csz.n - i) >= 0.5)
      |SELECT g.doc_id, g.n_words, g.quality_pass,
      |       (g.quality_pass AND f.doc_id IS NOT NULL) AS near_dup,
      |       (g.quality_pass AND f.doc_id IS NULL) AS admit
      |FROM gated g LEFT JOIN flagged f USING (doc_id)""".stripMargin))

  private val g10 = Q(
    "g10_stream_media_admission",
    // Incremental MEDIA admission — the g09 posture for the f11/f12
    // perceptual family: the archive's dHashes live in a DISK band index
    // (Multimodal.writeHashIndex, partitioned by band bucket); an arriving
    // media batch probes ONLY the partitions its own band keys hash into
    // (probeHashIndex — the pb isin lands in PartitionFilters, asserted in
    // MediaIndexSpec), so per-batch admission cost tracks the BATCH, not
    // the archive. Arrival mix: %20==0 exact re-uploads (hamming 0 against
    // their source), %20==10 single-pixel +16 perturbations (≤2 gradient
    // bits move — flagged through banding at recall 1), %20==15 truncated
    // payloads (dead-letter at decode, must never reach the pair set).
    // Every stage is stateless (the probed pb set is per-batch routing
    // metadata), so the batch result IS the streaming result — per-batch
    // union parity is MediaIndexSpec's batching-invariance test. The
    // oracle replays EVERYTHING analytically from the closed-form plane
    // (the f11 discipline): batch and archive hashes, band keys, candidate
    // join, hamming — a mis-read byte cannot hash-match.
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      val archive = operators.Multimodal.extractDhash(s,
        ids.map(id => (id, operators.Multimodal.syntheticPgm(id)))
          .toDF("doc_id", "payload"), "doc_id", "payload")
      val batch = operators.Multimodal.extractDhash(s,
        ids.flatMap { id =>
          val orig = operators.Multimodal.syntheticPgm(id)
          val re = if (id % 20 == 0) Seq((id + 500000, orig)) else Seq.empty
          val pert = if (id % 20 == 10) {
            val p = orig.clone()
            val plane = p.length - ((8 + id % 9) * (8 + id % 7)).toInt
            p(plane) = (((p(plane) & 0xff) + 16) % 256).toByte
            Seq((id + 600000, p))
          } else Seq.empty
          val dead = if (id % 20 == 15) Seq((id + 700000, orig.take(5))) else Seq.empty
          re ++ pert ++ dead
        }.toDF("doc_id", "payload"), "doc_id", "payload")
      val idxDir = operators.Scratch.dir("g10") + "/idx"
      operators.Multimodal.writeHashIndex(archive, idxDir)
      operators.Multimodal.probeHashIndex(s, idxDir, batch)
    },
    // the f11 dHash replay, batch × archive edition: analytic hashes for
    // both sides, 4×16-bit band equi-join, hamming ≤ 2
    Some("""WITH rws AS (
      |  SELECT doc_id AS row_id, doc_id AS d, FALSE AS pert, 0 AS side
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000, doc_id, FALSE, 1
      |  FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 600000, doc_id, TRUE, 1
      |  FROM documents WHERE doc_id % 20 = 10),
      |grid AS (
      |  SELECT row_id, d, pert, side, oy.i AS oy, ox.i AS ox,
      |         ((oy.i * (8 + d % 7)) // 8) * (8 + d % 9)
      |           + (ox.i * (8 + d % 9)) // 9 AS p
      |  FROM rws, generate_series(0, 7) oy(i), generate_series(0, 8) ox(i)),
      |gv AS (
      |  SELECT row_id, side, oy, ox,
      |         CASE WHEN pert AND p = 0 THEN ((d * 31) % 256 + 16) % 256
      |              ELSE (d * 31 + p * 7) % 256 END AS g
      |  FROM grid),
      |bits AS (
      |  SELECT row_id, side, oy, ox, g,
      |         lead(g) OVER (PARTITION BY row_id, oy ORDER BY ox) AS nxt
      |  FROM gv),
      |hsum AS (
      |  SELECT row_id, side,
      |         sum(CASE WHEN g < nxt
      |               THEN CAST(power(2, oy * 8 + ox) AS HUGEINT)
      |               ELSE 0::HUGEINT END) AS s
      |  FROM bits WHERE ox < 8 GROUP BY row_id, side),
      |hashes AS (
      |  SELECT row_id, side,
      |         CAST(CASE WHEN s >= 9223372036854775808
      |                THEN s - 18446744073709551616
      |                ELSE s END AS BIGINT) AS dhash
      |  FROM hsum),
      |bands AS (
      |  SELECT row_id, side, dhash, k.i AS k,
      |         (dhash >> (k.i * 16)) & 65535 AS key
      |  FROM hashes, generate_series(0, 3) k(i)),
      |cand AS (
      |  SELECT DISTINCT q.row_id, c.row_id AS corpus_id,
      |         q.dhash AS qh, c.dhash AS ch
      |  FROM bands q JOIN bands c
      |    ON q.k = c.k AND q.key = c.key
      |   AND q.side = 1 AND c.side = 0 AND q.row_id <> c.row_id)
      |SELECT row_id, corpus_id, CAST(bit_count(xor(qh, ch)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(qh, ch)) <= 2""".stripMargin))

  private val streamProfileCols = Seq(
    ("resource_id", "int"), ("bytes_sent", "int"),
    ("remote_addr", "str"), ("cache_status", "str"))

  private val g11 = Q(
    "g11_stream_profile",
    // CONTINUOUS ingest profiling (Profile.hourlyProfile) — b48's single-
    // pass profile under a time-window GROUP BY: per event hour and column,
    // row/null counts, KMV distinct estimate, canonical min/max. ONE
    // function serves both postures (count/min/max and the KMV udaf are
    // all partial-aggregating, so the same plan is a legal Structured
    // Streaming aggregation — append mode emits each hour once its window
    // closes under the watermark); this batch twin is the oracle gate and
    // StreamingSpec proves stream==batch over a chunked replay. Composed
    // with b49's drift this is the ingest-monitoring loop: profile each
    // arriving hour, drift it against yesterday.
    (s, dir) => operators.Profile.hourlyProfile(
      httpLog(s, dir), "ts", streamProfileCols),
    Some {
      s"""${HttpLog.cte}
         |, hrs_g AS (SELECT date_trunc('hour', ts) AS hr, * FROM http_log),
         |base_g AS (SELECT hr, count(*) AS n_rows FROM hrs_g GROUP BY 1),
         |${hourlyProfileSqlBlocks("g", streamProfileCols).mkString(",\n")}
         |${profileUnion("g", streamProfileCols)}""".stripMargin
    })

  /** g11's grouped (per-hour) profile replayed in SQL: the caller provides
    * CTEs `hrs_<tag>` (hr + the profiled columns) and `base_<tag>`
    * (hr, n_rows); this emits the per-column chains whose union
    * (`profileUnion(tag, cols)`) is the profile — reused by g12's drift.
    */
  private def hourlyProfileSqlBlocks(tag: String,
                                     cols: Seq[(String, String)]): Seq[String] = {
    def repr(c: String, kind: String): String = kind match {
      case "int" => s"CAST($c AS BIGINT)"
      case "num" => s"CAST(floor($c * 10000) AS BIGINT)"
      case "ts"  => s"epoch_us($c)"
      case _     => "CAST(NULL AS BIGINT)"
    }
    def hashSql(c: String, kind: String): String =
      if (kind == "str") s"md5($c)" else s"md5(CAST(${repr(c, kind)} AS VARCHAR))"
    cols.map { case (c, kind) =>
      val (minN, maxN) =
        if (kind == "str") ("min(CAST(NULL AS BIGINT))", "max(CAST(NULL AS BIGINT))")
        else (s"min(${repr(c, kind)})", s"max(${repr(c, kind)})")
      val (minS, maxS) =
        if (kind == "str") (s"min($c)", s"max($c)")
        else ("min(CAST(NULL AS VARCHAR))", "max(CAST(NULL AS VARCHAR))")
      s"""h_${tag}_$c AS (SELECT DISTINCT hr, ${hashSql(c, kind)} AS h FROM hrs_$tag WHERE $c IS NOT NULL),
         |r_${tag}_$c AS (SELECT hr, h, row_number() OVER (PARTITION BY hr ORDER BY h) AS rn,
         |         count(*) OVER (PARTITION BY hr) AS nd FROM h_${tag}_$c),
         |k_${tag}_$c AS (SELECT hr, max(nd) AS nd,
         |         max(CASE WHEN rn = 64 THEN h END) AS kth_hash FROM r_${tag}_$c GROUP BY 1),
         |s_${tag}_$c AS (SELECT hr, count($c) AS nn, $minN AS minn, $maxN AS maxn,
         |         $minS AS mins, $maxS AS maxs FROM hrs_$tag GROUP BY 1),
         |p_${tag}_$c AS (SELECT b.hr, '$c' AS "column", '$kind' AS kind,
         |  b.n_rows, b.n_rows - s.nn AS n_nulls,
         |  CAST(CASE WHEN coalesce(k.nd, 0) < 64 THEN coalesce(k.nd, 0)
         |       ELSE floor(63.0 / (CAST(greatest(${kmvDigitSum}, 1) AS DOUBLE)
         |                          / 4503599627370496.0)) END AS BIGINT) AS n_distinct_est,
         |  s.minn AS min_num, s.maxn AS max_num,
         |  s.mins AS min_str, s.maxs AS max_str
         |  FROM base_$tag b LEFT JOIN k_${tag}_$c k USING (hr) JOIN s_${tag}_$c s USING (hr))""".stripMargin
    }
  }

  private val g12 = Q(
    "g12_stream_drift",
    // The DEPLOYABLE monitoring composition: each arriving hour's profile
    // (g11's windowed aggregate, streaming-legal) drifted against a STATIC
    // baseline profile (b48 over the reference period) — per (hour, column)
    // ppm null-rate delta, ppm distinct ratio, and canonical-repr range
    // escape. Everything downstream of the two profile aggregates is a
    // stateless broadcast join on the |columns| axis, so the composition
    // stays legal after the streaming aggregation (StreamingSpec parity);
    // baseline = morning traffic (hour < 12), current = each afternoon
    // hour — the "today vs trailing baseline" alerting shape with a
    // deterministic, SQL-mirrorable split.
    (s, dir) => {
      val log = httpLog(s, dir)
      val baseline = operators.Profile.profile(
        log.filter(hour(col("ts")) < 12), streamProfileCols)
      val cur = operators.Profile.hourlyProfile(
        log.filter(hour(col("ts")) >= 12), "ts", streamProfileCols)
      operators.Profile.driftAgainst(cur, baseline, Seq("hr"))
    },
    Some {
      s"""${HttpLog.cte}
         |, hrs_d AS (SELECT date_trunc('hour', ts) AS hr, *
         |            FROM http_log WHERE hour(ts) >= 12),
         |base_d AS (SELECT hr, count(*) AS n_rows FROM hrs_d GROUP BY 1),
         |${hourlyProfileSqlBlocks("d", streamProfileCols).mkString(",\n")},
         |am AS (SELECT * FROM http_log WHERE hour(ts) < 12),
         |${profileSqlBlocks("am", "m", streamProfileCols).mkString(",\n")},
         |profc AS (${profileUnion("d", streamProfileCols)}),
         |profm AS (${profileUnion("m", streamProfileCols)})
         |SELECT c.hr, c."column", c.kind,
         |  c.n_rows AS n_rows_cur, p.n_rows AS n_rows_base,
         |  CAST(floor(c.n_nulls * 1000000 / c.n_rows)
         |       - floor(p.n_nulls * 1000000 / p.n_rows) AS BIGINT) AS null_rate_delta_e6,
         |  CAST(floor(c.n_distinct_est * 1000000
         |             / greatest(p.n_distinct_est, 1)) AS BIGINT) AS distinct_ratio_e6,
         |  (coalesce(c.min_num < p.min_num, FALSE)
         |   OR coalesce(c.max_num > p.max_num, FALSE)
         |   OR coalesce(c.min_str < p.min_str, FALSE)
         |   OR coalesce(c.max_str > p.max_str, FALSE)) AS range_widened
         |FROM profc c JOIN profm p ON c."column" = p."column"""".stripMargin
    })

  private val g13 = Q(
    "g13_stream_e2e_recovery",
    // The reference's DEPLOYMENT posture end-to-end, crash included (r9
    // verdict task #1): Kafka-shaped frame files → capnp decode with
    // dead-letter split → anonymize → offset-keyed watermark dedup →
    // per-micro-batch partial totals through the idempotent replace-
    // partition sink (streaming/Recovery.scala documents the exactly-once
    // argument piece by piece). The gated run is TWO process lifetimes:
    // half the replay drains, then the pipeline "crashes" in the
    // reference's failure window — the newest DATA batch's sink write
    // landed, its offset commit didn't (Recovery.crashBeforeCommit cuts
    // the checkpoint at that batch) — then restarts from checkpoint,
    // REPLAYS that data batch into its own partition (asserted in-gate:
    // the partition's part files are provably rewritten), survives 100
    // cross-restart redeliveries against the restored dedup state, and
    // drains the rest.
    // The at-least-once arrival mix: every 5th log redelivered within its
    // file, every 97th also delivered truncated (dead-letters at decode),
    // the 100 newest lifetime-1 logs redelivered AFTER the restart. The
    // final re-aggregated totals hash against the plain one-shot batch
    // oracle (a04's totals, anonymized) — any loss, duplication, or
    // double-count across the crash reddens the gate.
    (s, dir) => {
      val root = operators.Scratch.dir("g13")
      val framesDir = s"$root/frames"; val ckpt = s"$root/ckpt"
      val sink = s"$root/sink"
      // frames in EVENT-TIME order, split into 8 files = 8 micro-batches:
      // file boundaries respect ts order, so no original is ever below
      // the 2-hour watermark when its batch runs (dups ride adjacent to
      // their originals and stay above it too — and a late DUP dropping
      // would be correct anyway). The global position is the e24
      // two-level scheme (rank within hour buckets + prefix-summed
      // bucket offsets broadcast back), NOT a global Window.orderBy —
      // even harness data prep must have no single-partition stage, or
      // the gate itself stops scaling (r10 verdict task #4). The hour
      // bucket is a prefix of the (ts, log_id) order, so positions are
      // identical to the global rank.
      val n = httpLogMs(s, dir).count()
      val keyed = httpLogMs(s, dir)
        .withColumn("bkt", date_trunc("hour", col("ts")))
      val perBkt = keyed.withColumn("pos_in_bkt",
        row_number().over(
          Window.partitionBy("bkt").orderBy(col("ts"), col("log_id"))).cast("long"))
      val bktOffsets = keyed.groupBy("bkt").agg(count(lit(1)).as("nb"))
        .withColumn("off",
          coalesce(
            sum("nb").over(Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select("bkt", "off")
      val base = perBkt.join(broadcast(bktOffsets), "bkt")
        .withColumn("pos", col("off") + col("pos_in_bkt"))
        .withColumn("file_no", floor((col("pos") - 1) * 8 / n).cast("int"))
        .withColumn("value", capnpMsg)
        .select(col("value"), col("pos"), col("file_no"), col("log_id"))
      val originals = base.select(col("value"), col("pos").as("offset"), col("file_no"))
      val dups = base.filter(col("log_id") % 5 === 0)
        .select(col("value"), col("pos").as("offset"), col("file_no"))
      val corrupt = base.filter(col("log_id") % 97 === 0)
        .select(expr("substring(value, 1, 8)").as("value"),
          (col("pos") + 10000000L).as("offset"), col("file_no"))
      val redelivered = base.filter(col("file_no") === 3)
        .orderBy(col("pos").desc).limit(100)
        .select(col("value"), col("pos").as("offset"), lit(4).as("file_no"))
      val deliveries = originals.unionByName(dups).unionByName(corrupt)
        .unionByName(redelivered)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      deliveries.count()
      def writeFiles(files: Range): Unit = files.foreach { i =>
        sources.KafkaShaped.framesFromPayloads(
            deliveries.filter(col("file_no") === i), "value", "offset")
          .coalesce(1).write.mode("append").parquet(framesDir)
      }
      writeFiles(0 to 3) // lifetime 1: half the stream arrives and drains
      streaming.Recovery.runUntilDrained(s, framesDir, ckpt, sink)
      // ...then the crash, cut so the newest surviving checkpoint entry
      // is a DATA batch whose sink write landed but whose offset commit
      // didn't (trailing no-data watermark batch erased — r10 ADVICE:
      // Spark replays only the offset log's head, so anything else would
      // replay an empty batch and prove nothing)
      val replayId = streaming.Recovery.crashBeforeCommit(ckpt)
      def partFiles(): Set[String] = Option(
        new java.io.File(s"$sink/batch_id=$replayId").list()).toSet.flatten
          .filter(_.endsWith(".parquet"))
      val filesBeforeReplay = partFiles()
      require(filesBeforeReplay.nonEmpty,
        s"crash cut at batch $replayId but its sink partition is missing")
      writeFiles(4 to 7) // more data lands while the pipeline is down
      streaming.Recovery.runUntilDrained(s, framesDir, ckpt, sink)
      // the replay must have actually re-executed batch `replayId` and
      // rewritten its own partition (fresh part files), not just found
      // totals that happen to match
      require(partFiles().nonEmpty && partFiles() != filesBeforeReplay,
        s"batch $replayId was not genuinely replayed: partition untouched")
      deliveries.unpersist(blocking = false)
      streaming.Recovery.finalTotals(s, sink)
    },
    Some(s"""${HttpLog.cte}
      |SELECT date_trunc('hour', ts) AS ts_hour,
      |       resource_id, response_status, cache_status,
      |       $anonV4Sql AS remote_addr,
      |       count(*) AS requests,
      |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
      |       CAST(sum(request_time_milli) AS BIGINT) AS total_time_milli
      |FROM http_log
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin))

  private val g14 = Q(
    "g14_stream_quality_gate",
    // The stream-vs-static LM ADMISSION gate registered (promoted from
    // spec-only — the r9 promotion pattern): incoming docs scored against
    // a unigram LM trained on the static corpus (stream-static equi-join,
    // stateless; per-(window, doc) agg bounded by the watermark), admitted
    // by cross-entropy threshold — the "is this prose?" sibling of g03's
    // "have we seen this?". ONE function serves both postures (watermark
    // is a no-op on batch; StreamingSpec proves stream==batch AND
    // salad-rejection through MemoryStream); this batch twin is the
    // oracle gate. Arrival mix: the full corpus (ce ∈ [3.38, 3.72] at
    // both SFs — admitted) + every 7th doc re-arriving as 12-token
    // all-OOV salad (ce = ln(2·total_tokens) ≈ 13 — rejected); threshold
    // 6.0 sits ≥ 2.3 nats from either population, so the verdict is
    // rounding-immune. The oracle replays the LM (exact counts), the
    // OOV smoothing, and the per-token avg under the e18 4-dp round
    // discipline.
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val (lm, oovLogp) = streaming.QualityGate.trainLm(docs, "text")
      val junk = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), expr(
          "concat_ws(' ', transform(sequence(1, 12), " +
            "i -> concat('zzq', CAST(doc_id AS STRING), 'x', CAST(i AS STRING))))")
          .as("text"))
        .select((col("doc_id") + 300000).as("doc_id"), col("text"))
      val arriving = docs.select(col("doc_id"), col("text")).unionByName(junk)
        .withColumn("ts", expr("timestamp_millis(1700000000000 + doc_id * 60000)"))
      streaming.QualityGate.gate(
        arriving, "ts", "doc_id", "text", lm, oovLogp, maxCe = 6.0)
    },
    Some("""WITH lm0 AS (
      |  SELECT term, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0 GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM lm0),
      |arriving AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |         concat_ws(' ', list_transform(range(1, 13),
      |                                       i -> 'zzq' || doc_id || 'x' || i))
      |  FROM documents WHERE doc_id % 7 = 0),
      |t AS (
      |  SELECT doc_id, term FROM (
      |    SELECT doc_id,
      |           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |    FROM arriving)
      |  WHERE length(term) > 0),
      |scored AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |         round(-avg(coalesce(ln(lm0.cnt / tot.tot), ln(0.5 / tot.tot))), 4) AS ce
      |  FROM t LEFT JOIN lm0 USING (term) CROSS JOIN tot
      |  GROUP BY t.doc_id)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ce,
      |       ce <= 6.0 AS admit
      |FROM scored""".stripMargin))

  private val g15 = Q(
    "g15_stream_lm_maintenance",
    // Incremental LM maintenance registered (promoted from spec-only —
    // the model-state sibling of g13's totals): the corpus arrives as 4
    // micro-batches, each writing only its own PARTIAL (term, cnt)
    // aggregate into its batch_id partition (mergeable aggregation state
    // through the idempotent-sink argument), with one batch REPLAYED
    // inside the gate (failure between write and checkpoint commit) —
    // the replay must overwrite exactly itself. The snapshot merge
    // (LmMaintenance.currentLm, one vocab-sized groupBy sum) must then
    // equal the one-shot full-corpus counts — any double-count from the
    // replay, lost partial, or partition clobber reddens the hash. The
    // emitted model surface (logp + OOV smoothing at 4 dp, exact counts,
    // exact token total) is what QualityGate (g14) consumes, so this row
    // certifies the gate's model stays correct as the corpus grows.
    (s, dir) => {
      val path = operators.Scratch.dir("g15") + "/counts"
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val sink = streaming.LmMaintenance.countsSink(path, "text")
      (0 until 4).foreach { b =>
        sink(docs.filter(pmod(col("doc_id"), lit(4)) === b), b.toLong)
      }
      sink(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 2L) // forced replay
      val (lm, oovLogp) = streaming.LmMaintenance.currentLm(s, path)
      val counts = s.read.parquet(path).groupBy("term").agg(sum("cnt").as("cnt"))
      val tot = counts.agg(sum("cnt")).head().getLong(0)
      counts.join(lm, "term")
        .select(col("term"), col("cnt"),
          round(col("logp"), 4).as("logp_4"),
          lit(tot).as("total_tokens"),
          round(lit(oovLogp), 4).as("oov_logp_4"))
    },
    Some("""WITH c AS (
      |  SELECT term, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0 GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c)
      |SELECT term, CAST(cnt AS BIGINT) AS cnt,
      |       round(ln(cnt / tot.tot), 4) AS logp_4,
      |       CAST(tot.tot AS BIGINT) AS total_tokens,
      |       round(ln(0.5 / tot.tot), 4) AS oov_logp_4
      |FROM c CROSS JOIN tot""".stripMargin))

  private val g16 = Q(
    "g16_stream_ivf_maintenance",
    // Incremental IVF index maintenance registered (promoted from
    // spec-only — the INDEX-state sibling of g15's model counts):
    // vectors arrive in 3 micro-batches, each assigned to the FROZEN
    // trained quantizer by the stateless per-row argmax
    // (IvfMaintenance.attach — no shuffle, no retrain) and appended
    // under dual (batch_id, cell) partitioning: dynamic overwrite on
    // batch_id makes a replayed batch overwrite exactly itself (forced
    // inside the gate), while the cell subdirectories keep the index
    // PROBE partition-pruned (asserted in-gate: a cell-filtered read
    // carries the cell PartitionFilter). The final index contents hash
    // against the d03-discipline oracle: the ENTIRE quantizer replayed
    // in SQL (seed centroids, one Lloyd round with the float-cast
    // quantization, cosine argmax with the cid-DESC tie-break) over the
    // arrivals — a replay duplicate, lost batch, or drifted assignment
    // reddens it.
    (s, dir) => {
      val path = operators.Scratch.dir("g16") + "/index"
      val emb = Tables.embeddings(s, dir)
      val centroids = Similarity.ivfCentroids(emb, nCells = 16, refineIters = 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      centroids.count() // train ONCE; every micro-batch reuses the frozen set
      val arrivals = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      def sink(b: DataFrame, id: Long): Unit =
        streaming.IvfMaintenance.attach(b, centroids)
          .withColumn("batch_id", lit(id))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id", "cell").parquet(path)
      (0 until 3).foreach { b =>
        sink(arrivals.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      sink(arrivals.filter(pmod(col("vec_id"), lit(3)) === 1), 1L) // forced replay
      centroids.unpersist(blocking = false)
      val idx = s.read.parquet(path)
      val someCell = idx.select(col("cell")).limit(1).head().get(0)
      val probed = idx.filter(col("cell") === someCell)
      val scans = physicalNodes(probed.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      require(scans.nonEmpty && scans.forall(
        _.partitionFilters.exists(_.references.exists(_.name == "cell"))),
        "maintained index must stay cell-prunable")
      idx.select(col("vec_id"), col("cell").cast("bigint").as("cell"))
    },
    Some("""WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, e AS cv FROM emb WHERE vec_id < 16),
      |r0 AS (SELECT a.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY a.vec_id
      |           ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |       FROM emb a CROSS JOIN c0 c),
      |a0 AS (SELECT vec_id, cid AS cell FROM r0 WHERE rn = 1),
      |m1 AS (SELECT a0.cell, s.i,
      |         CAST(CAST(avg(round(a.e[s.i] * 1048576) / 1048576) AS REAL) AS DOUBLE) AS v
      |       FROM a0 JOIN emb a USING (vec_id), generate_series(1, 64) s(i)
      |       GROUP BY a0.cell, s.i),
      |c1 AS (SELECT cell AS cid, list(v ORDER BY i) AS cv FROM m1 GROUP BY cell),
      |arr AS (SELECT vec_id + 100000 AS vec_id, e FROM emb WHERE vec_id % 25 = 0),
      |asg AS (SELECT a.vec_id, c.cid AS cell,
      |          row_number() OVER (PARTITION BY a.vec_id
      |            ORDER BY list_cosine_similarity(a.e, c.cv) DESC, c.cid DESC) AS rn
      |        FROM arr a CROSS JOIN c1 c)
      |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg WHERE rn = 1""".stripMargin))

  /** Shared harness for the streamed-sketch rows (g17/g18): replay `src`
    * through a REAL streaming groupBy in 4 file-per-trigger micro-batches
    * (the state store in the loop between every pair), capture the final
    * complete-mode result on disk, and assert in-gate that (a) the replay
    * genuinely crossed ≥4 batch boundaries and (b) the state store held
    * O(|groups|) sketch rows — the bounded-state property that makes
    * these sketches the 100 TB streaming posture (an exact
    * countDistinct/top-k would checkpoint O(|distinct values|) rows).
    */
  private def streamedSketch(s: SparkSession, tag: String, src: DataFrame,
                             chunkOf: Column,
                             aggOf: DataFrame => DataFrame): DataFrame = {
    val root = operators.Scratch.dir(tag)
    val chunks = s"$root/chunks"; val ckpt = s"$root/ckpt"
    val outP = s"$root/final"
    val chunked = src.withColumn("chunk", chunkOf)
    (0 until 4).foreach { c =>
      chunked.filter(col("chunk") === c).drop("chunk")
        .coalesce(1).write.mode("append").parquet(chunks)
    }
    val sinkFn: (DataFrame, Long) => Unit =
      (b, _) => b.write.mode("overwrite").parquet(outP)
    val q = aggOf(
        s.readStream.schema(s.read.parquet(chunks).schema)
          .option("maxFilesPerTrigger", 1).parquet(chunks))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("complete")
      .foreachBatch(sinkFn)
      .start()
    try q.processAllAvailable() finally q.stop()
    val progress = q.recentProgress
    val dataBatches = progress.count(_.numInputRows > 0)
    require(dataBatches >= 4,
      s"$tag: chunked replay collapsed to $dataBatches micro-batches")
    val peakState = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      .maxOption.getOrElse(0L)
    // |groups| = the complete-mode result's row count (one sketch row per
    // group is the whole contract) — computed from the data, not hard-coded,
    // so a testdata cardinality change can't spuriously redden the gate
    val out = s.read.parquet(outP)
    val groups = out.count()
    require(peakState > 0 && peakState <= groups,
      s"$tag: streaming sketch state must be O(|groups|) rows " +
        s"(|groups|=$groups), got $peakState")
    out
  }

  private val g17 = Q(
    "g17_stream_kmv_distinct",
    // The streaming-KMV promotion (r10 verdict task #2): b23's distinct
    // sketch through a REAL streaming groupBy — 4 file-replay
    // micro-batches, the O(k) sketch buffer (not every distinct value)
    // being what the state store checkpoints between them (both
    // properties asserted in-gate via [[streamedSketch]]). The sketch is
    // SET-deterministic (merge law pinned in KmvSpec), so the streamed
    // final state hash-gates against b23's EXACT batch oracle — same SQL,
    // same columns: stream == batch IS the registered claim, not a
    // weaker contract check.
    (s, dir) => {
      val agg = operators.Kmv.kmv_distinct(64)
      streamedSketch(s, "g17",
        Tables.events(s, dir).select(col("event_type"),
          md5(col("user_id").cast("string").cast("binary")).as("h"),
          col("event_id")),
        pmod(col("event_id"), lit(4)),
        df => df.groupBy("event_type").agg(agg(col("h")).as("r")))
        .select(col("event_type"), col("r.n_tracked").as("n_tracked"),
          col("r.kth_hash").as("kth_hash"),
          col("r.est_distinct").as("est_distinct"))
    },
    Some(kmvUserByTypeOracle))

  private val g18 = Q(
    "g18_stream_heavy_hitters_top",
    // The streaming-SpaceSaving promotion (r10 verdict task #2), under
    // the b45/b47 "planted separation" discipline ACROSS batch
    // boundaries: within each event_type half of all events land on a
    // group-specific planted value, so its estimate's lower bound beats
    // every real user's upper bound under ANY merge order — including
    // the state-store merges between the 4 replayed micro-batches —
    // making the per-group rank-1 identity hash-checkable even though
    // the estimates legitimately vary with batching. Same exact oracle
    // as the batch twin (b47); StreamingSpec additionally pins the full
    // [true, true+err] estimation contract across batches.
    (s, dir) => {
      val planted = when(col("event_id") % 2 === 0,
        -(length(col("event_type")).cast("long") * 1000 +
          ascii(col("event_type")).cast("long")))
        .otherwise(col("user_id"))
      streamedSketch(s, "g18",
        Tables.events(s, dir).select(col("event_type"), planted.as("v"),
          col("event_id")),
        pmod(col("event_id"), lit(4)),
        df => df.groupBy("event_type")
          .agg(graft.functions.heavy_hitters(col("v"), 8).as("hh")))
        .select(col("event_type"),
          element_at(col("hh"), 1).getField("value").as("top_value"),
          size(col("hh")).cast("int").as("n_tracked"))
    },
    Some(hhPlantedTopOracle))

  private val g03 = Q(
    "g03_stream_neardup_screen",
    // stream-vs-static admission screen, batch twin: every 10th document
    // re-arrives with 3 extra tokens (a near-dup re-crawl at j≈0.9) and must
    // flag against its corpus source. The screen plan is stateless, so the
    // batch result IS the streaming result (parity proven in StreamingSpec);
    // the oracle mirrors it with exact cross gram-Jaccard (LSH recall 1 at
    // j≥0.5 on this corpus — c02's argument).
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val incoming = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" streamscreen probe suffix")))
      streaming.NearDupScreen.screen(incoming, docs, "doc_id", "text")
    },
    Some("""WITH incoming AS (
      |  SELECT doc_id + 200000 AS doc_id, text || ' streamscreen probe suffix' AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |itoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM incoming
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                        x -> x <> '')) > 0),
      |igrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM itoks),
      |ctoks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                        x -> x <> '')) > 0),
      |cgrams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE t END) AS g
      |  FROM ctoks),
      |iex AS (SELECT doc_id, unnest(g) AS gram FROM igrams),
      |cex AS (SELECT doc_id AS corpus_id, unnest(g) AS gram FROM cgrams),
      |inter AS (
      |  SELECT doc_id, corpus_id, count(*) AS i
      |  FROM iex JOIN cex USING (gram) GROUP BY 1, 2),
      |isz AS (SELECT doc_id, len(g) AS n FROM igrams),
      |csz AS (SELECT doc_id AS corpus_id, len(g) AS n FROM cgrams)
      |SELECT doc_id, corpus_id,
      |       round(CAST(i AS DOUBLE) / (isz.n + csz.n - i), 4) AS jaccard
      |FROM inter JOIN isz USING (doc_id) JOIN csz USING (corpus_id)
      |WHERE CAST(i AS DOUBLE) / (isz.n + csz.n - i) >= 0.5""".stripMargin))

  private val g04 = Q(
    "g04_stream_interval_join",
    (s, dir) => {
      // Stream-stream attribution join, batch twin: clicks paired with the
      // same user's purchases within 4 hours. The transform is watermark-
      // bounded on both event times in streaming (state = rows inside the
      // window, not stream history); parity proven in StreamingSpec.
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"), col("value").as("amount"))
      streaming.IntervalJoin.attribute(clicks, buys, windowMinutes = 240)
    },
    Some("""WITH c AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id AS p_user, event_id AS buy_id, ts AS buy_ts,
      |         value AS amount
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, click_id, buy_id,
      |       date_diff('second', click_ts, buy_ts) AS secs_to_buy, amount
      |FROM c JOIN p ON user_id = p_user
      |  AND buy_ts >= click_ts
      |  AND buy_ts < click_ts + INTERVAL 240 MINUTE""".stripMargin))

  // ----------------------------------------------------------------

  val all: Seq[Q] = Seq(
    a00, a01, a02, a03, a04, a05, a06, a07, a08, a09, a10, a11, a12, a13, a14, a15,
    a16, a17, a18, a19, a20, a21, a22, a23, a24,
    b01, b02, b03, b04, b05, b06, b07, b08, b09, b10, b11, b12, b13, b14, b15, b16,
    b17, b18, b19, b20, b21, b22, b23, b24, b25, b26, b27, b28, b29, b30,
    b31, b32, b33, b34, b35, b36, b37, b38, b39, b40, b41, b42, b43, b44, b45,
    b46, b47, b48, b49, b50, b51, b52, b53, b54,
    c01, c02, c03, c04, c05, c06, c07, c08, c09, c10, c11, c12, c13, c14, c15, c16, c17, c18,
    c19, c20,
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14, d15,
    e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11, e12, e13, e14, e15, e16, e17,
    e18, e19, e20, e21, e22, e23, e24, e25, e26, e27, e28, e29,
    f01, f02, f03, f04, f05, f06, f07, f08, f09, f10, f11, f12, f13,
    g01, g02, g03, g04, g05, g06, g07, g08, g09, g10, g11, g12, g13, g14, g15,
    g16, g17, g18)
}
