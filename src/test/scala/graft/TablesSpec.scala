package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events timestamp-vintage adapter must normalize every generation the
  * driver has shipped — INT64 epoch-nanos BIGINT, TIMESTAMP_NTZ micros, and
  * plain TIMESTAMP micros — to one (ts_ns: long, ts: timestamp) pair with
  * identical VALUES and identical column positions. A silent schema change
  * here once nulled every events-reading query for a whole round (the r6
  * artifact gap), so the contract gets its own regression gate instead of
  * riding on whichever vintage the current testdata happens to be.
  */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  // one known instant: 2024-01-01 00:00:00.123456 UTC
  private val micros = 1704067200123456L

  private def writeVintage(dir: String, tsExpr: String): Unit =
    spark.range(1).select(
        lit(7L).as("event_id"),
        expr(tsExpr).as("ts"),
        lit(42L).as("user_id"),
        lit("view").as("event_type"),
        lit(1.5).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def check(dir: String, vintage: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.columns.toSeq == Seq("event_id", "ts_ns", "user_id",
      "event_type", "value", "ts"), s"$vintage: columns ${ev.columns.toSeq}")
    assert(ev.schema("ts_ns").dataType.typeName == "long", vintage)
    assert(ev.schema("ts").dataType.typeName == "timestamp", vintage)
    val r = ev.select("ts_ns", "ts").first()
    assert(r.getLong(0) == micros * 1000, s"$vintage: ts_ns ${r.getLong(0)}")
    assert(r.getTimestamp(1).getTime == micros / 1000,
      s"$vintage: ts ${r.getTimestamp(1)}")
  }

  test("BIGINT epoch-nanos vintage normalizes") {
    withTempDir("vintage_nanos") { dir =>
      writeVintage(dir, s"cast(${micros}L * 1000 as bigint)")
      check(dir, "nanos-bigint")
    }
  }

  test("TIMESTAMP micros vintage normalizes (the GraftSession read path)") {
    withTempDir("vintage_ts") { dir =>
      writeVintage(dir, s"timestamp_micros(${micros}L)")
      check(dir, "timestamp")
    }
  }

  test("TIMESTAMP_NTZ vintage normalizes under both inference settings") {
    withTempDir("vintage_ntz") { dir =>
      // parquet annotation isAdjustedToUTC=false — the post-r7 driver vintage
      writeVintage(dir, s"cast(timestamp_micros(${micros}L) as timestamp_ntz)")
      // GraftSession default: inference off → plain-TIMESTAMP branch
      check(dir, "ntz-inference-off")
      // foreign sessions that infer NTZ → the cast-fallback branch
      val saved = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
      try {
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        check(dir, "ntz-inference-on")
      } finally
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", saved)
    }
  }
}
