package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `private[sql] Dataset.ofRows` — the standard technique for
  * extension libraries that materialize a DataFrame from a custom
  * LogicalPlan (the public API offers no constructor for third-party
  * logical nodes; session extensions only INJECT rules/strategies). Scoped
  * to exactly this one call. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** private[sql] NormalizeFloatingNumbers.normalize: -0.0 → 0.0 and NaN
    * canonicalization, the same treatment Spark's own Aggregate/Window/
    * Join keys get — needed by custom grouping operators (TopKPerKeyExec)
    * for float-key group identity. */
  def normalizeFloat(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
