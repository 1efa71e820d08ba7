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

  /** `localCheckpoint` that TRUNCATES STATISTICS along with lineage.
    *
    * `Dataset.localCheckpoint` copies the originating plan's ESTIMATED
    * `Statistics` onto the `LogicalRDD` it returns (`originStats`,
    * `LogicalRDD.fromDataset`). In an iterative algorithm whose round
    * plan self-joins the previous round's checkpoint (pointer-doubling
    * connected components, label-of-label joins), the size-only estimator
    * multiplies children sizes at every Join, so the carried `sizeInBytes`
    * SQUARES per round: by round ~18 it is a BigInt with millions of
    * digits and `SizeInBytesOnlyStatsPlanVisitor` spends hours inside
    * `BigInteger.multiply` — the driver hangs in planning, not execution
    * (observed live on q_dbscan at sf0.01, jstack in SCALE.md).
    *
    * This wrapper checkpoints eagerly, then rebuilds the `LogicalRDD`
    * with stats MEASURED from the block manager (the blocks were just
    * materialized, so the sizes are real, and reading them is free — no
    * extra job). Estimates stop compounding across rounds, and downstream
    * joins see actual sizes, which is strictly better for broadcast
    * decisions than a round-N estimate. */
  def localCheckpointMeasured(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val cds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cds.sparkSession
    val ck = cds.localCheckpoint() // eager: blocks exist before we measure
    ck.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr } match {
      case Some(lr) =>
        val measured = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id).map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
        // fallback (blocks evicted already / info lag): schema width, not
        // the child plan's estimate — never re-import the compounded stats
        val size = measured.getOrElse(
          math.max(1L, cds.schema.map(_.dataType.defaultSize).sum.toLong * 1000L))
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          spark, Some(Statistics(sizeInBytes = BigInt(size))), None)
        classic.Dataset.ofRows(spark, fresh)
      case None => ck
    }
  }

  /** Drain the async listener bus so a QueryExecutionListener registered
    * by the caller has seen every completed execution (the bus delivers
    * on its own thread; `waitUntilEmpty` is private[spark]). Used by
    * PlanAudit's side-effecting-query capture. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)

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
