package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `encode_word(lower(x))` ≡ `encode_word(x)` — the
  * encoding lowercases internally (`WorkerSender.java:135`) and lowercasing
  * is idempotent, so a user-written lower() under it is dead work. Removing
  * it keeps the child column eligible for pushdown and saves a per-row
  * string allocation.
  *
  * NOT rewritten: `encode_word(upper(x))` — upper-then-lower is NOT the
  * identity (e.g. "straße".toUpperCase = "STRASSE" lowers back to
  * "strasse" ≠ "straße"), so that rewrite would change results.
  *
  * Demonstrates the `Rule[LogicalPlan]` extension tier (SURVEY.md §7):
  * algebraic simplification over an engine-owned expression, injected via
  * [[GraftExtensions]].
  */
object EncodeWordSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EncodeWordExpression(Lower(child)) => EncodeWordExpression(child)
    }
}
