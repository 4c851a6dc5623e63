package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory physical-plan guard: every registered query must plan
  * without a CartesianProduct, at every future round.
  *
  * PLANS.md proves this for the headline queries of one round as a generated
  * artifact; this spec makes it a permanent regression gate over ALL of
  * [[Queries.all]] — a new query (or a join-condition typo that silently
  * drops an equi-predicate: the classic way a bucketed band join degenerates
  * into |corpus|² work at 100 TB) fails CI instead of shipping.
  *
  * BroadcastNestedLoopJoin is deliberately NOT banned: share-of-total
  * queries (b28/b29 style) cross-join a 1-row aggregate, which Spark plans
  * as a broadcast loop join over one row — constant work at any scale.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTestBase {

  test("no registered query plans a CartesianProduct") {
    val offenders = Queries.all.flatMap { q =>
      // construction may run bounded driver-side routing jobs (IVF
      // codebooks, BPE merge rounds) — sf0.001 keeps those sub-second
      val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString()
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in physical plan of: ${offenders.mkString(", ")}")
    assert(Queries.all.nonEmpty)
  }
}
