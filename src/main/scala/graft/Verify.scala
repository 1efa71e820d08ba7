package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Forensic record of what THIS run produced: the dumped parquet read
    * back, columns sorted by name, rows totally ordered, first `cap` rows
    * as one pipe-joined line each → `outDir-rows/<name>.txt` (deliberately
    * a SIBLING of outDir — see the in-body comment). A later
    * hash-mismatch report (driver or dev/check.py) can then be diagnosed
    * against the exact rows of the failing run instead of a re-run that
    * may no longer reproduce (the round-4 q_kmeans episode). Never fatal:
    * unsortable column types (maps) or any IO error just skip the dump. */
  def dumpCanonical(spark: SparkSession, outDir: String, name: String,
                    cap: Int = 10000): Unit =
    try {
      import org.apache.spark.sql.functions.col
      val back = spark.read.parquet(s"$outDir/$name")
      val cols = back.columns.sorted.toSeq
      val n = back.count()
      val lines = back.select(cols.map(col): _*)
        .orderBy(cols.map(col): _*)
        .limit(cap).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|"))
      // sibling of outDir, NOT inside it: the driver parquet-globs every
      // entry under outDir, and a rows/ text dir there records a permanent
      // failing "rows" entry in the correctness gate (r5 artifact)
      new java.io.File(s"$outDir-rows").mkdirs()
      Files.writeString(Paths.get(s"$outDir-rows/$name.txt"),
        s"rows=$n cols=${cols.mkString(",")}\n" +
          lines.mkString("", "\n", "\n"))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name canonical dump skipped: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing names: dump only those queries (dev loop); the
    // driver passes none and gets the full catalog
    val only = args.drop(2).toSet
    val spark = Sessions.build()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumpCanonical(spark, outDir, name)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // caches persist()ed inside query builders must not accumulate
      // across the 60+ query dumps
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
