package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-audit artifact: per catalog query, counts of the physical-plan
  * features the SCALE.md shuffle inventory makes claims about —
  * Exchanges (shuffles), broadcast vs sort-merge joins, nested-loop /
  * cartesian fallbacks, whole-stage-codegen spans — emitted as one JSON
  * file so the inventory is machine-checkable instead of prose-only.
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [outPath] [names...]"
  *
  * Formatted mode prints each node once in the numbered tree; counting
  * `(n) NodeName` lines keeps duplicates out.
  *
  * SIDE-EFFECTING queries (sinks, streams, upserts — the `Executed` set)
  * are audited by EXECUTION instead of being skipped (round-10: a write
  * query could hide a cartesian in the plan it executes): a
  * QueryExecutionListener captures the physical plan of every action the
  * builder runs — including writes to temp tables and foreachBatch
  * micro-batches — and the counts aggregate over all captured plans plus
  * the returned read-back plan. Pure streaming incremental executions do
  * not fire the listener; those queries' sink plans all route through
  * foreachBatch batch writes, which do.
  *
  * Note: operators that localCheckpoint internally (graph loops, Ranks
  * riders) execute their early rounds during CONSTRUCTION; in this audit
  * those rounds are CAPTURED by the same listener (each checkpoint is an
  * execution), so the per-round shapes show up in the counts rather than
  * being lost behind the checkpoint boundary.
  */
object PlanAudit {

  /** Builders that side-effect (write temp tables, run streams): audited
    * by executing them under the capture listener. */
  private val Executed = Set(
    "q_sink_roundtrip", "q_sink_text_roundtrip", "q_sink_csv_roundtrip",
    "q_sink_json_roundtrip", "q_sink_orc_roundtrip", "q_sink_xml_roundtrip",
    "q_sink_nested_roundtrip", "q_stream_synth", "q_csv_corrupt",
    "q_partitioned_scan", "q_partition_overwrite", "q_compact",
    "q_join_bucketed", "q_upsert", "q_cdc_apply", "q_schema_evolution",
    "q_synth_source", "q_dpp", "q_stream_join_sink",
    "q_stream_sink_roundtrip", "q_stream_window_sink", "q_zorder",
    "q_stream_dedup_sink", "q_stream_cms_sink", "q_stream_hll_sink",
    "q_stream_session_sink", "q_stream_recent_sink", "q_stream_typecount_sink")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = if (args.length > 1) args(1)
                  else "/root/repo/target/plan_audit.json"
    val only = args.drop(2).toSet
    val spark = Sessions.build(cpus = "4", logLevel = "ERROR")
    def nodeCount(p: String, name: String): Int =
      s"\\(\\d+\\) $name".r.findAllIn(p).length
    def counts(plans: Seq[String], executed: Int): Map[String, Int] = Map(
      "exchanges" -> plans.map(nodeCount(_, "Exchange")).sum,
      "broadcast_joins" -> plans.map(p => nodeCount(p, "BroadcastHashJoin") +
        nodeCount(p, "BroadcastNestedLoopJoin")).sum,
      "sortmerge_joins" -> plans.map(nodeCount(_, "SortMergeJoin")).sum,
      "shuffled_hash_joins" -> plans.map(nodeCount(_, "ShuffledHashJoin")).sum,
      "cartesian" -> plans.map(nodeCount(_, "CartesianProduct")).sum,
      "windows" -> plans.map(nodeCount(_, "Window")).sum,
      "codegen_spans" ->
        plans.map("WholeStageCodegen".r.findAllIn(_).length).sum,
      "audited_executions" -> executed)
    // capture listener: explain strings of every completed execution.
    // The listener bus is async — drained via waitUntilEmpty before read.
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var capturing = false
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        if (capturing) captured.add(
          qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val rows = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
      .flatMap { name =>
        try {
          if (Executed(name)) {
            captured.clear()
            capturing = true
            val df = SparkEntry.queries(name)(spark, sfDir)
            val ret = df.queryExecution
              .explainString(org.apache.spark.sql.execution.FormattedMode)
            // drain the async listener bus so every captured plan is in
            org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
            capturing = false
            val plans = ret +: captured.toArray(Array.empty[String]).toSeq
            Some(name -> counts(plans, plans.size - 1))
          } else {
            val p = SparkEntry.queries(name)(spark, sfDir).queryExecution
              .explainString(org.apache.spark.sql.execution.FormattedMode)
            Some(name -> counts(Seq(p), 0))
          }
        } catch { case e: Throwable =>
          capturing = false
          System.err.println(s"[audit] $name failed: ${e.getMessage}")
          None
        }
      }
    val json = rows.map { case (n, m) =>
      s""""$n": {${m.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}"""
    }.mkString("{\n", ",\n", "\n}")
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.writeString(Paths.get(outPath), json)
    val totEx = rows.map(_._2("exchanges")).sum
    val nCart = rows.count(_._2("cartesian") > 0)
    println(s"PLAN_AUDIT queries=${rows.size} total_exchanges=$totEx " +
      s"cartesian_queries=$nCart -> $outPath")
    spark.stop()
  }
}
