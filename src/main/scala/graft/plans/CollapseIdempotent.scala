package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{AnonymizeIp, NfcNormalize}

/** Optimizer rule: collapse nested applications of graft's IDEMPOTENT
  * expressions — `anonymize_ip(anonymize_ip(x)) → anonymize_ip(x)` and
  * `nfc_normalize(nfc_normalize(x)) → nfc_normalize(x)`.
  *
  * Why it exists: pipelines COMPOSE. The flagship ETL anonymizes on
  * ingest, and a defensive downstream stage (or a user joining two
  * graft-built views) re-applies the same normalization "to be safe" — at
  * 100 TB that second pass is a full extra string scan per row for a
  * provable no-op. Idempotence is part of each function's contract
  * (anonymization: masking a masked address is the mask; NFC: composition
  * is a fixed point, spec-proven in e17), so the engine, not the user,
  * should delete the redundancy — the same philosophy as Catalyst's own
  * expression-simplification rules.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * `spark.sql.extensions` deployments and via
  * `spark.experimental.extraOptimizations` in
  * [[graft.GraftFunctions.register]] for imperative setups.
  */
object CollapseIdempotent extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case AnonymizeIp(inner: AnonymizeIp) => inner
      case NfcNormalize(inner: NfcNormalize) => inner
    }
}
