package graft

import org.apache.spark.sql.SparkSession

/** Single SparkSession recipe for every main (Bench/Verify/Smoke/Explain)
  * — the cross-engine-parity configs (UTC, nanosAsLong) must never drift
  * between entry points. */
object Sessions {
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            logLevel: String = "WARN"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
