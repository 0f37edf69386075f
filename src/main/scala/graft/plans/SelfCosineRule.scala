package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSimilarity, SelfCosine}

/** Optimizer rule: cosine_sim(x, x) ⇒ self_cosine(x).
  *
  * The rewrite replaces the three-accumulator dot/norm loop with a
  * single-accumulator scan on the self-join diagonal of pairwise
  * similarity matrices. NOT a literal 1.0: SelfCosine computes the
  * self-dot d and returns d/(√d·√d) — the exact arithmetic the full
  * kernel performs on (x, x) — so the rule is BIT-identical on every
  * input (generally ≠ 1.0 at ULP level; NaN/Inf elements → NaN,
  * zero/empty → NaN, null elements → NULL), and an ==1.0 or >=threshold
  * filter cannot flip on whether the rule fired. Demonstrates the
  * engine's Rule[LogicalPlan] extension point (SURVEY §7: custom rules
  * only where they buy something concrete).
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}
