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

  /** Wrapper over private[spark] ExternalSorter (whose TYPE cannot leak
    * into graft packages) bound to the CURRENT task's memory manager: it
    * acquires execution memory through the task context and spills to
    * disk under pressure — the same machinery HashAggregateExec falls
    * back on. Used by TopKPerKeyExec's high-key-cardinality fallback.
    * Spill files are released by the task-completion listener registered
    * at construction. */
  final class SpillableKVSorter(
      ord: Ordering[org.apache.spark.sql.catalyst.expressions.UnsafeRow]) {
    private type UR = org.apache.spark.sql.catalyst.expressions.UnsafeRow
    private val sorter = new org.apache.spark.util.collection.ExternalSorter[UR, UR, UR](
      org.apache.spark.TaskContext.get(), None, None, Some(ord),
      org.apache.spark.SparkEnv.get.serializer)
    org.apache.spark.TaskContext.get()
      .addTaskCompletionListener[Unit](_ => sorter.stop())
    /** Caller passes OWNED (copied) rows. */
    def insert(key: UR, value: UR): Unit = sorter.insertAll(Iterator((key, value)))
    /** Grouped-sorted by `ord`; consumable once. */
    def iterator: Iterator[(UR, UR)] = sorter.iterator.map(p => (p._1, p._2))
  }
}
