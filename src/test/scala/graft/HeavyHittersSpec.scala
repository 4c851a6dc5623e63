package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.heavy_hitters

/** SpaceSaving heavy hitters (`heavy_hitters(value, k)`): the estimation
  * CONTRACT is what a bounded-memory frequency sketch can promise, and these
  * tests pin exactly that — never a specific estimate, which legitimately
  * varies with partition layout inside the [true, true+err] band.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def skewed(n: Long) = spark.range(n).select(
    when(col("id") % 4 < 2, lit(9001L))         // 50%
      .when(col("id") % 4 === 2, lit(9002L))    // 25%
      .otherwise(col("id") % 500)               // ~0.05% each
      .as("v"))

  private def entries(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(heavy_hitters(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("exact when distinct values fit the budget") {
    val df = spark.range(1000).select((col("id") % 10).as("v"))
    val es = entries(df, 16)
    assert(es.length == 10)
    es.foreach { case (v, est, err) =>
      assert(est == 100L, s"value $v: est $est")
      assert(err == 0L, s"value $v carries error with spare budget")
    }
  }

  test("skewed data: guaranteed presence, bounded overcount, bounded error") {
    val n = 100000L
    val k = 16
    val truth = skewed(n).groupBy("v").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 16).foreach { parts => // merge-order robustness: both layouts honor the contract
      val es = entries(skewed(n).repartition(parts), k)
      assert(es.length == k)
      val byV = es.map { case (v, e, err) => v -> ((e, err)) }.toMap
      // every value with true frequency > 2n/k survives every merge trim
      truth.filter(_._2 > 2 * n / k).keys.foreach { hot =>
        assert(byV.contains(hot), s"hot value $hot missing at $parts partitions")
      }
      es.foreach { case (v, est, err) =>
        val t = truth.getOrElse(v, 0L)
        assert(est >= t, s"$v underestimated: $est < $t")
        assert(est <= t + err, s"$v est $est above true+err ${t + err}")
        assert(err <= n / k, s"$v err $err above n/k")
      }
      // the two planted heavy hitters rank first, exactly counted or better
      val top2 = es.sortBy(-_._2).take(2).map(_._1).toSet
      assert(top2 == Set(9001L, 9002L))
    }
  }

  test("plans as ObjectHashAggregate (the KeepLatest argument)") {
    val df = skewed(10000).agg(heavy_hitters(col("v"), 8).as("hh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("SQL surface: heavy_hitters registered and literal-k enforced") {
    GraftFunctions.register(spark)
    skewed(1000).createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT explode(heavy_hitters(v, 4)) AS e FROM hh_in")
      .select(col("e.value")).collect().map(_.getLong(0))
    assert(rows.length == 4 && rows.contains(9001L) && rows.contains(9002L))
  }

  test("null inputs are skipped, not counted") {
    val df = spark.range(100).select(
      when(col("id") % 2 === 0, col("id") % 3).otherwise(lit(null)).as("v"))
    val es = entries(df, 8)
    assert(es.map(_._2).sum == 50, "only non-null rows counted")
  }
}
