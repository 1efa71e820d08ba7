package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for catalog queries.
  * Usage: runMain graft.Explain [sfDir] [queryName...] (default: all). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.build(cpus = "4", logLevel = "ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
