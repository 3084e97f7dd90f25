package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ops.{NfcNormalize, StripAccents, TitleCase}

/** Optimizer rule for the engine's custom string normalizers: they are
  * all idempotent (f(f(x)) = f(x)), and NFC inside strip_accents is
  * redundant (strip_accents NFD-decomposes its input first, and
  * NFD(NFC(x)) = NFD(x) by Unicode canonical-equivalence), so nested
  * applications collapse to one call. Real pipelines hit this when
  * composing library stages that each defensively normalize — e.g.
  * `fingerprint(nfc_normalize(text))` over an input that a previous
  * stage already normalized. Injected via
  * [[graft.GraftExtensions]]`.injectOptimizerRule`; fires before
  * whole-stage codegen, so the collapsed call is what gets compiled.
  */
object CollapseIdempotentNorms extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
      case StripAccents(inner @ StripAccents(_)) => inner
      case TitleCase(inner @ TitleCase(_))       => inner
      case StripAccents(NfcNormalize(x))         => StripAccents(x)
    }
}
