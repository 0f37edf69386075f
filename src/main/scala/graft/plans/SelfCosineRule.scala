package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSimilarity, SelfCosine}

/** Optimizer rule: cosine_sim(x, x) ⇒ self_cosine(x).
  *
  * The rewrite replaces the three-accumulator dot/norm loop with a
  * single-array scan on the self-join diagonal of pairwise similarity
  * matrices. NOT a literal 1.0: the kernel yields NaN for zero vectors
  * and NaN/Inf elements, and an optimizer rule must never change
  * results — SelfCosine preserves exactly those cases. Demonstrates the
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
