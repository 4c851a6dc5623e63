package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory physical-plan guard: every registered query must audit
  * free of error-severity hazards ([[graft.plans.PlanAudit]] — today that
  * means no CartesianProduct), at every future round.
  *
  * PLANS.md proves this for the headline queries of one round as a generated
  * artifact; this spec makes it a permanent regression gate over ALL of
  * [[Queries.all]] — a new query (or a join-condition typo that silently
  * drops an equi-predicate: the classic way a bucketed band join degenerates
  * into |corpus|² work at 100 TB) fails CI instead of shipping. It also
  * exercises the audit API on every real plan in the inventory, so an
  * audit-walker regression (a node class it stops descending through)
  * surfaces here.
  *
  * Warn-severity findings are NOT asserted empty: bounded-by-construction
  * frames (the two-level prefix-sum's level-2 window, 25-row rollups) are
  * legitimate and documented per-query in PLANS.md; PlanAudit's contract is
  * reviewer triage, not a ban. BroadcastNestedLoopJoin likewise stays legal:
  * share-of-total queries cross-join a broadcast 1-row aggregate — constant
  * work at any scale.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTestBase {

  test("no registered query plans an error-severity hazard (PlanAudit sweep)") {
    val offenders = Queries.all.flatMap { q =>
      // construction may run bounded driver-side routing jobs (IVF
      // codebooks, BPE merge rounds) — sf0.001 keeps those sub-second
      val errors = plans.PlanAudit
        .audit(q.fn(spark, sfDir))
        .filter(_.severity == "error")
      if (errors.nonEmpty) Some(s"${q.name}: ${errors.mkString("; ")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    assert(Queries.all.nonEmpty)
  }
}
