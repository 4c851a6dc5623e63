package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HttpLog, Skew}

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted two-phase aggregation equals direct aggregation") {
    val hl = HttpLog.view(Tables.events(spark, sfDir))
    val direct = hl.groupBy("resource_id")
      .agg(count(lit(1)).as("row_cnt"), sum("bytes_sent").as("bytes_sent_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(hl, Seq("resource_id"), Seq("bytes_sent"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salt stage spreads a hot key over multiple sub-keys") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1L)).toDF("k", "v")
    val out = Skew.saltedSumCount(hot, Seq("k"), Seq("v"), salts = 8).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 1000L) // row_cnt
    assert(out.head.getLong(2) == 1000L) // v_sum
  }
}
