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

  /** The OTHER half of the skew story: salting (above) is the explicit
    * rewrite for aggregations; for plain shuffle joins the engine relies on
    * AQE's runtime skew-join split (`GraftSession` enables it). This proves
    * the reliance is real — a join with one dominant key, thresholds scaled
    * to test size, must come back with its skewed partition actually SPLIT
    * (`skew=true` on the join's shuffle read) and still produce exact
    * results. If a config rename or session regression silently disabled
    * AQE skew handling, this fails instead of a 100 TB job straggling.
    */
  test("AQE splits the skewed side of a shuffle join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key carrying ~97% of the fact side, joined to a dim too big
      // to broadcast under the forced threshold
      val fact = spark.range(60000)
        .select(when(col("id") % 30 =!= 0, lit(7L)).otherwise(col("id") % 500)
          .as("k"), col("id").as("v"))
      val dim = spark.range(500).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS frame (count() would finalize a different plan tree,
      // leaving joined's adaptive plan unfinalized)
      assert(joined.collect().length == 60000,
        "skew split must not duplicate or drop rows")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
