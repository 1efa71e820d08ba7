package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Lower, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `encode_word(lower(x))` ≡ `encode_word(upper(x))` ≡
  * `encode_word(x)` — the encoding lowercases internally
  * (`WorkerSender.java:135`), so a user-written case-normalization under it
  * is dead work. Removing it keeps the child column eligible for pushdown
  * and saves a per-row string allocation.
  *
  * Demonstrates the `Rule[LogicalPlan]` extension tier (SURVEY.md §7):
  * algebraic simplification over an engine-owned expression, injected via
  * [[GraftExtensions]].
  */
object EncodeWordSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EncodeWordExpression(Lower(child)) => EncodeWordExpression(child)
      case EncodeWordExpression(Upper(child)) => EncodeWordExpression(child)
    }
}
