package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

class SelectionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // (doc_id, quality, tok_count)
  private def docs = Seq(
    (1L, 0.9, 100L), (2L, 0.9, 50L), (3L, 0.7, 200L),
    (4L, 0.5, 100L), (5L, 0.3, 400L), (6L, 0.1, 10L))
    .toDF("doc_id", "quality", "tok_count")

  test("budget selection equals the driver-computed greedy prefix") {
    // rank order: 1 (100), 2 (150), 3 (350), 4 (450), 5 (850), 6 (860)
    val got = Selection.budgetSelect(docs, "doc_id", "quality", "tok_count", 450L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 100L, 2L -> 150L, 3L -> 350L, 4L -> 450L))
  }

  test("a doc that would overflow the budget is excluded, later smaller ones too") {
    // greedy PREFIX semantics: once cum exceeds budget nothing later re-enters
    val got = Selection.budgetSelect(docs, "doc_id", "quality", "tok_count", 449L)
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)))
  }

  test("output is invariant under repartitioning and bucket count") {
    val a = Selection.budgetSelect(docs, "doc_id", "quality", "tok_count", 850L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = Selection.budgetSelect(docs.repartition(5), "doc_id", "quality",
        "tok_count", 850L, buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a == b && a.size == 5)
  }

  test("no corpus-wide single-partition window in the plan") {
    val plan = Selection.budgetSelect(docs, "doc_id", "quality", "tok_count", 450L)
      .queryExecution.optimizedPlan.toString
    // the per-bucket window must be partitioned; only the tiny bucket-totals
    // window (over the groupBy output) may be global
    val windows = "windowspecdefinition\\(".r.findAllIn(plan.toLowerCase).size
    assert(windows >= 2, s"expected per-bucket + offsets windows:\n$plan")
    assert(plan.contains("bkt"), plan)
  }

  test("epoch shuffle is a bijection onto 1..N, differs by epoch, repeats exactly") {
    val docs = Tables.documents(spark, sfDir).limit(300)
    val n = docs.count()
    val e7 = Selection.epochShuffle(docs, "doc_id", epoch = 7).cache()
    try {
      assert(e7.count() == n)
      // bijection: positions are exactly 1..N
      val posAgg = e7.agg(min("shuffle_pos"), max("shuffle_pos"),
        countDistinct("shuffle_pos")).first()
      assert(posAgg.getLong(0) == 1L && posAgg.getLong(1) == n && posAgg.getLong(2) == n)
      // deterministic: a second run is identical
      val again = Selection.epochShuffle(docs, "doc_id", epoch = 7)
      assert(e7.except(again).isEmpty && again.except(e7).isEmpty)
      // a different epoch is a genuinely different permutation
      val e8 = Selection.epochShuffle(docs, "doc_id", epoch = 8)
      val moved = e7.as("a").join(e8.as("b"), "doc_id")
        .filter(col("a.shuffle_pos") =!= col("b.shuffle_pos")).count()
      assert(moved > n / 2, s"only $moved of $n docs moved between epochs")
    } finally e7.unpersist()
  }
}
