package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Lower, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `lower(encode_word(x))` ≡ `upper(encode_word(x))` ≡
  * `encode_word(x)` — the encoding's output is a digit string, and case
  * mapping is the identity on digits in every locale, so a defensive case
  * normalization ABOVE the expression is dead work (one string allocation
  * per row).
  *
  * NOT rewritten: case normalization BELOW the expression.
  * `encode_word(lower(x))` → `encode_word(x)` looks safe because encode
  * lowercases internally, but Spark's `Lower` lowercases with the JVM
  * default locale while encode pins Locale.ROOT — on a tr-TR JVM
  * `lower("Iş")` is "ış" (dotless ı, dropped by encode) while
  * `encode_word("Iş")` is "09", so that rewrite would change results.
  * Same for `upper` ("straße" → "STRASSE" → "strasse" ≠ "straße").
  *
  * Demonstrates the `Rule[LogicalPlan]` extension tier (SURVEY.md §7):
  * algebraic simplification over an engine-owned expression, injected via
  * [[GraftExtensions]].
  */
object EncodeWordSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Lower(e: EncodeWordExpression) => e
      case Upper(e: EncodeWordExpression) => e
    }
}
