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
}
