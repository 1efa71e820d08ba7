package graft

import org.apache.spark.sql.SparkSession

/** Single SparkSession recipe for every main (Bench/Verify/Smoke/Explain)
  * — the cross-engine-parity configs (UTC, nanosAsLong) must never drift
  * between entry points. */
object Sessions {
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            logLevel: String = "WARN"): SparkSession = {
    // Locale-independence belt+braces (build.sbt pins -Duser.language for
    // forked JVMs; this covers spark-submit / embedded callers): Spark's
    // lower() non-ASCII path and Java toLowerCase use the JVM default
    // locale, which must not drift from the DuckDB oracle's behavior.
    java.util.Locale.setDefault(java.util.Locale.US)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // full extension surface incl. the parser tier (GRAFT TOPK dialect);
      // the parser can only be injected at session build
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
