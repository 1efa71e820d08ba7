package graft

import java.nio.file.{Files, Paths}

/** Plan-audit artifact: per catalog query, counts of the physical-plan
  * features the SCALE.md shuffle inventory makes claims about —
  * Exchanges (shuffles), broadcast vs sort-merge joins, nested-loop /
  * cartesian fallbacks, whole-stage-codegen spans — emitted as one JSON
  * file so the inventory is machine-checkable instead of prose-only.
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [outPath] [names...]"
  *
  * Formatted mode prints each node once in the numbered tree; counting
  * `(n) NodeName` lines keeps duplicates out. Queries whose builders
  * side-effect (sinks, streaming) are skipped — their shapes are pinned
  * by their own specs. Note: operators that localCheckpoint internally
  * (graph loops, Ranks riders) execute their early rounds during
  * CONSTRUCTION, so this audit sees only their post-checkpoint tail —
  * the per-round shapes are asserted by the operator specs instead.
  */
object PlanAudit {

  private val Skip = Set(
    "q_sink_roundtrip", "q_sink_text_roundtrip", "q_sink_csv_roundtrip",
    "q_sink_json_roundtrip", "q_sink_orc_roundtrip", "q_sink_xml_roundtrip",
    "q_sink_nested_roundtrip", "q_stream_synth", "q_csv_corrupt",
    "q_partitioned_scan", "q_partition_overwrite", "q_compact",
    "q_join_bucketed", "q_upsert", "q_cdc_apply", "q_schema_evolution",
    "q_synth_source", "q_dpp", "q_stream_join_sink",
    "q_stream_sink_roundtrip", "q_stream_window_sink", "q_zorder")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = if (args.length > 1) args(1)
                  else "/root/repo/target/plan_audit.json"
    val only = args.drop(2).toSet
    val spark = Sessions.build(cpus = "4", logLevel = "ERROR")
    def nodeCount(p: String, name: String): Int =
      s"\\(\\d+\\) $name".r.findAllIn(p).length
    val rows = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Skip)
      .filter(n => only.isEmpty || only(n))
      .flatMap { name =>
        try {
          val p = SparkEntry.queries(name)(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          Some(name -> Map(
            "exchanges" -> nodeCount(p, "Exchange"),
            "broadcast_joins" -> (nodeCount(p, "BroadcastHashJoin") +
              nodeCount(p, "BroadcastNestedLoopJoin")),
            "sortmerge_joins" -> nodeCount(p, "SortMergeJoin"),
            "shuffled_hash_joins" -> nodeCount(p, "ShuffledHashJoin"),
            "cartesian" -> nodeCount(p, "CartesianProduct"),
            "windows" -> nodeCount(p, "Window"),
            "codegen_spans" ->
              "WholeStageCodegen".r.findAllIn(p).length))
        } catch { case e: Throwable =>
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
