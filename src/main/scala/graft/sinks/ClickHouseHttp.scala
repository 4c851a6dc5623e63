package graft.sinks

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** The reference sink's insert path re-expressed for Spark: batched HTTP
  * inserts with fixed-delay retry, wired as a `foreachBatch` sink.
  *
  * Reference semantics (`/root/reference/anonymizer/src/sink.rs:258`,
  * `error.rs:76-89` `async_retry`): an insert is attempted up to
  * `tries + 1` times with a fixed delay between attempts; when retries are
  * exhausted the insert FAILS — and because the failure propagates out of
  * `foreachBatch`, the streaming checkpoint does not advance and the source
  * replays the batch (the reference's manual commit-after-insert). Delivery
  * is therefore at-least-once, restored to exactly-once by the
  * ReplacingMergeTree table the DDL in [[ClickHouseDdl]] declares.
  *
  * Unlike the single-node reference, the insert itself runs per PARTITION on
  * the executors — N parallel inserts per micro-batch, which is the posture
  * a 1000-executor cluster needs (the driver never sees the rows).
  */
object ClickHouseHttp {

  /** One row as a ClickHouse `TabSeparated` line (tab/newline/backslash
    * escaped; timestamps in ClickHouse's `YYYY-MM-DD hh:mm:ss` form; UTC).
    */
  def tsvLine(row: Row): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append('\t')
      row.get(i) match {
        case null => sb.append("\\N")
        case ts: java.sql.Timestamp =>
          val fmt = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss")
            .withZone(java.time.ZoneOffset.UTC)
          sb.append(fmt.format(ts.toInstant))
        case s: String =>
          s.foreach {
            case '\t' => sb.append("\\t")
            case '\n' => sb.append("\\n")
            case '\\' => sb.append("\\\\")
            case c    => sb.append(c)
          }
        case other => sb.append(other.toString)
      }
      i += 1
    }
    sb.toString
  }

  /** Fixed-delay retry, reference `async_retry` semantics: run `f`; on
    * failure sleep and retry while attempts remain; rethrow the final error.
    */
  def retry[T](tries: Int, delayMs: Long, sleep: Long => Unit = Thread.sleep)
              (f: => T): T = {
    var remaining = tries
    while (true) {
      try return f
      catch {
        case e: Exception =>
          if (remaining <= 0) throw e
          remaining -= 1
          sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** POST `body` to `endpoint/?query=<query>`; non-2xx → IOException carrying
    * the server's error text (the reference surfaces ClickHouse's exception
    * body the same way).
    */
  def post(endpoint: String, query: String, body: Array[Byte]): Unit = {
    val url = URI.create(
      endpoint + "/?query=" + URLEncoder.encode(query, StandardCharsets.UTF_8)).toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      val out = conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val code = conn.getResponseCode
      if (code / 100 != 2) {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8))
          .getOrElse("")
        throw new IOException(s"insert failed: HTTP $code $err")
      }
      // drain so the connection is reusable
      val in = conn.getInputStream
      try in.readAllBytes() finally in.close()
    } finally conn.disconnect()
  }

  /** `foreachBatch` sink: every partition posts its rows as one
    * `INSERT INTO … FORMAT TabSeparated` with retry. Any partition that
    * exhausts its retries fails the Spark task → the micro-batch fails → the
    * checkpoint does not advance → the batch replays (at-least-once).
    */
  def insertSink(endpoint: String, table: String, schema: StructType,
                 tries: Int = 3, delayMs: Long = 100): (DataFrame, Long) => Unit = {
    val query = ClickHouseDdl.insertDdl(table, schema) + " FORMAT TabSeparated"
    (batch: DataFrame, _: Long) =>
      batch.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val body = rows.map(tsvLine).mkString("", "\n", "\n")
            .getBytes(StandardCharsets.UTF_8)
          retry(tries, delayMs)(post(endpoint, query, body))
        }
      }
  }
}
