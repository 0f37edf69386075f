package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.CosineSimilarity

/** Optimizer rule: cosine_sim(x, x) ⇒ 1.0 (null-preserving).
  *
  * Algebraically cos(x, x) = 1 for any non-null vector; the rewrite
  * skips the full dot/norm loop when both sides are the same attribute —
  * the self-join diagonal in pairwise similarity matrices. Demonstrates
  * the engine's Rule[LogicalPlan] extension point (SURVEY §7: custom
  * rules only where they buy something concrete).
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
    }
}
