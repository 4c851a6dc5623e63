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

  test("SQL surface rejects a non-literal k with a clear analysis error") {
    GraftFunctions.register(spark)
    skewed(100).createOrReplaceTempView("hh_in_badk")
    for (badK <- Seq("v", "'eight'", "CAST(NULL AS INT)")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT heavy_hitters(v, $badK) FROM hh_in_badk").collect()
      }
      assert(e.getMessage.contains("k must be an integer literal"),
        s"k=$badK: ${e.getMessage}")
    }
  }

  test("kmv_distinct on the SQL surface: works with literal k, rejects non-literal") {
    GraftFunctions.register(spark)
    skewed(1000).createOrReplaceTempView("kmv_sql_in")
    val r = spark.sql(
      """SELECT kmv_distinct(md5(CAST(CAST(v AS STRING) AS BINARY)), 64).est_distinct AS d
        |FROM kmv_sql_in""".stripMargin).head()
    // true distinct = 127 (9001, 9002, and the 125 tail values 3,7,…,499);
    // k=64 → SE ≈ 1/√62 ≈ 13%, so a 40% band is ~3σ
    assert(math.abs(r.getLong(0) - 127L) <= 51, s"est ${r.getLong(0)} vs true 127")
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(CAST(v AS STRING), v) FROM kmv_sql_in").collect()
    }
    assert(e.getMessage.contains("k must be an integer literal"))
  }

  test("grouped: the O(k)-per-group contract composes with GROUP BY at 1 and 16 partitions") {
    // b46/b47's shape — per-group SpaceSaving state under a real GROUP BY.
    // 3 groups × (one dominant value at 50% of the group + a uniform tail)
    val n = 60000L
    val base = spark.range(n).select(
      (col("id") % 3).cast("string").as("g"),
      when(col("id") % 2 === 0, lit(-1L) - col("id") % 3) // per-group plant
        .otherwise(col("id") % 200).as("v"))
    val k = 8
    val perGroup = n / 3
    val truth = base.groupBy("g", "v").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq(1, 16).foreach { parts =>
      val agg = base.repartition(parts)
        .groupBy("g").agg(heavy_hitters(col("v"), k).as("hh"))
      val rows = agg.select(col("g"), explode(col("hh")).as("e"))
        .select(col("g"), col("e.value"), col("e.est"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.groupBy(_._1).forall(_._2.length == k), "k entries per group")
      rows.foreach { case (g, v, est, err) =>
        val t = truth.getOrElse((g, v), 0L)
        assert(est >= t && est <= t + err, s"[$g,$v] est $est outside [true, true+err], true=$t")
      }
      // per-group presence above the MERGED 2n_g/k bound, and the planted
      // dominant value is rank 1 in its group
      (0 until 3).map(_.toString).foreach { g =>
        val inG = rows.filter(_._1 == g)
        truth.collect { case ((`g`, v), t) if t > 2 * perGroup / k => v }.foreach { hot =>
          assert(inG.exists(_._2 == hot), s"group $g lost hot value $hot at $parts parts")
        }
        assert(inG.maxBy(_._3)._2 == -1L - g.toLong, s"group $g rank-1 not the plant")
      }
      // plan shape: one aggregation (partial+final ObjectHashAggregate),
      // no SortAggregate demotion, and only the group-key exchange
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), plan)
      assert(!plan.contains("SortAggregate"), plan)
    }
  }
}
