package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.sinks.ClickHouseDdl

class AsOfSpec extends AnyFunSuite with SparkTestBase {

  test("joinPrior attaches the latest strictly-prior state per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 50L, "e0"), (2L, 100L, "x1"))
      .toDF("k", "t", "ev")
    val state = Seq((1L, 100L, "s@100"), (1L, 150L, "s@150"), (2L, 500L, "s@500"))
      .toDF("k", "t", "st")
    val got = AsOf.joinPrior(left, state, Seq("k"), "t", Seq("st"))
      .select("k", "t", "ev", "asof_st")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> Option(r.getString(3)))
      .toMap
    assert(got((1L, 50L, "e0")).isEmpty)            // nothing prior
    assert(got((1L, 100L, "e1")).isEmpty)           // same-ts state NOT visible (strict)
    assert(got((1L, 200L, "e2")).contains("s@150"))
    assert(got((2L, 100L, "x1")).isEmpty)           // state only later
  }

  test("ClickHouse DDL matches the reference table layout") {
    val ddl = ClickHouseDdl.tableDdl("http_log", ClickHouseDdl.httpLogSchema,
      orderBy = Seq("resource_id", "response_status", "remote_addr", "timestamp"))
    // reference http_log.rs:94-108
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS http_log"))
    assert(ddl.contains("timestamp DateTime NOT NULL"))
    assert(ddl.contains("resource_id UInt64 NOT NULL"))
    assert(ddl.contains("response_status UInt16 NOT NULL"))
    assert(ddl.contains("cache_status LowCardinality(String) NOT NULL"))
    assert(ddl.contains("method LowCardinality(String) NOT NULL"))
    assert(ddl.contains("remote_addr String NOT NULL"))
    assert(ddl.contains("ENGINE = ReplacingMergeTree"))
    assert(ddl.contains("PARTITION BY toYYYYMM(timestamp)"))
    assert(ddl.contains("ORDER BY (resource_id, response_status, remote_addr, timestamp)"))
    assert(ClickHouseDdl.insertDdl("http_log", ClickHouseDdl.httpLogSchema)
      .startsWith("INSERT INTO http_log (timestamp, resource_id,"))
    intercept[IllegalArgumentException] {
      ClickHouseDdl.tableDdl("bad; DROP TABLE x", ClickHouseDdl.httpLogSchema, Seq("a"))
    }
  }
}
