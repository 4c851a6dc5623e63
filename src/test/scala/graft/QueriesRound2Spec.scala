package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the round-2 query additions (SURVEY.md §2:
  * a14, b15, b16, e08, e09). The DuckDB hash-compare is the exactness gate;
  * these assert the invariants a hash can't explain when it breaks.
  */
class QueriesRound2Spec extends AnyFunSuite with SparkTestBase {

  private def q(name: String) =
    Queries.all.find(_.name == name).get.fn(spark, sfDir)

  test("a14_url_stats parses hosts and query params back out of built URLs") {
    val rows = q("a14_url_stats").collect()
    assert(rows.nonEmpty)
    val hosts = rows.map(_.getAs[String]("host")).toSet
    assert(hosts.subsetOf((0 until 5).map(i => s"h$i.example.com").toSet))
    val caches = rows.map(_.getAs[String]("cache")).toSet
    assert(caches.subsetOf(Set("HIT", "MISS", "EXPIRED")))
    // every (host, cache) bucket kept its traffic
    assert(rows.forall(r => r.getAs[Long]("requests") > 0))
    assert(rows.forall(r => r.getAs[Long]("uniq_paths") > 0))
  }

  test("b15_grouping_sets levels are internally consistent") {
    val rows = q("b15_grouping_sets").collect()
    val byGid = rows.groupBy(_.getAs[Int]("gid"))
    // gid 0 = (status, priority), gid 2 = (priority), gid 3 = grand total
    assert(byGid.keySet == Set(0, 2, 3))
    val grand = byGid(3).head.getAs[Long]("orders_cnt")
    assert(byGid(0).map(_.getAs[Long]("orders_cnt")).sum == grand)
    assert(byGid(2).map(_.getAs[Long]("orders_cnt")).sum == grand)
    // the skipped (status)-only level must not appear, NULL values must only
    // appear on aggregated-away columns (gid flags, not data NULLs)
    assert(byGid(2).forall(r => r.isNullAt(r.fieldIndex("o_orderstatus"))))
    assert(byGid(0).forall(r => !r.isNullAt(r.fieldIndex("o_orderstatus"))))
  }

  test("b16_inflight_by_day covers the sampled year and only counts open intervals") {
    val rows = q("b16_inflight_by_day").collect()
    assert(rows.length == 12, "one row per sampled month-start")
    assert(rows.forall(_.getAs[Long]("in_flight") > 0))
    // spot-check one day against a direct filter
    val d = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") <= lit(d) && lit(d) < col("l_shipdate"))
      .count()
    val fromQuery = rows.find(_.getAs[java.sql.Timestamp]("d") == d).get.getAs[Long]("in_flight")
    assert(fromQuery == direct)
  }

  test("e08_pii_redact removes every planted identifier") {
    val rows = q("e08_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(r.getAs[Int]("pii_found") >= 3, "all three planted PII kinds found")
      assert(!red.contains("@"), "no email survives")
      assert(!red.contains("+1-555-"), "no phone survives")
      assert(!red.matches(".*\\b10\\.[0-9]+\\.[0-9]+\\.[0-9]+\\b.*"), "no IP survives")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    }
  }

  test("e09_repetition ratios are coherent") {
    val rows = q("e09_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = r.getAs[Long]("toks")
      val uniq = r.getAs[Long]("uniq_toks")
      assert(uniq >= 1 && uniq <= toks)
      val dr = r.getAs[Double]("distinct_ratio")
      val tr = r.getAs[Double]("top_tok_ratio")
      assert(dr > 0 && dr <= 1.0)
      assert(tr > 0 && tr <= 1.0)
      // top token can't be rarer than the mean token frequency
      assert(tr + 1e-4 >= 1.0 / uniq)
    }
    // a pathological doc trips the flag
    import spark.implicits._
    val rep = Seq((1L, ("spam " * 50) + "one two three")).toDF("doc_id", "text")
    val out = Queries.all.find(_.name == "e09_repetition").get
    // reuse the operator shape inline: explode → doc×term → doc
    val terms = rep.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val flag = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("toks"), max("cnt").as("top_cnt"))
      .select((col("top_cnt") * 5 > col("toks")).as("repetitive"))
      .head().getBoolean(0)
    assert(flag)
    assert(out != null)
  }
}
