package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** Semantic properties of BM25 retrieval (e25's hash oracle proves the
  * arithmetic; these prove the ranking MEANS relevance).
  */
class Bm25Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join spark join spark join"),      // high tf, short
    (2L, "spark join and many other words about nothing in particular here"),
    (3L, "spark only spark appears here spark"),   // one term only
    (4L, "join only join appears here join"),
    (5L, "completely unrelated text about databases"),
    (6L, "rare unicorn token appears once"),
    (7L, "spark join pad pad"),                    // two terms, same length as 8
    (8L, "spark spark pad pad")                    // one term twice, same length
  ).toDF("doc_id", "text")

  test("docs matching more query terms with higher tf rank first; saturation holds") {
    val qs = Seq((0L, "spark join")).toDF("query_id", "qtext")
    val out = Bm25.search(docs, qs, "doc_id", "text", "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("doc_id") == 1L) // dense short both-term doc wins
    val ranks = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    // at EQUAL length and equal total matches, covering both query terms
    // beats repeating one — the saturation property that makes BM25 BM25
    assert(ranks(7L) < ranks(8L),
      s"two distinct matched terms must beat the same term twice: $ranks")
    assert(!ranks.contains(5L) && !ranks.contains(6L), "non-matching docs must not appear")
    // tf saturation: tripling tf must not triple the contribution
    val s1 = out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("score")
    val s3 = out.find(_.getAs[Long]("doc_id") == 3L).get.getAs[Double]("score")
    assert(s1 < 3 * s3, s"BM25 must saturate tf: $s1 vs 3x$s3")
  }

  test("rare terms outweigh common ones (idf) and repeated query terms accumulate") {
    val qs = Seq((0L, "unicorn spark"), (1L, "spark"), (2L, "spark spark"))
      .toDF("query_id", "qtext")
    val out = Bm25.search(docs, qs, "doc_id", "text", "query_id", "qtext", k = 10)
    val q0 = out.filter(col("query_id") === 0).orderBy("rank").collect()
    assert(q0.head.getAs[Long]("doc_id") == 6L,
      "the sole doc with the rare term must outrank common-term docs")
    // doubled query term exactly doubles each doc's score (linear in query tf)
    val s1 = out.filter(col("query_id") === 1).select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = out.filter(col("query_id") === 2).select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    s1.foreach { case (d, v) => assert(math.abs(s2(d) - 2 * v) < 1e-3) }
  }
}
