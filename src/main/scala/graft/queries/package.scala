package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query catalog.
  *
  * Determinism rules (every query must hash-match a DuckDB oracle at sf0.01):
  *  - every query ends with a total, tie-broken ORDER BY;
  *  - no raw double SUMs: double aggregates go through an exact DECIMAL cast
  *    ([[queries.dsum]]) so summation order (Spark partitioning vs DuckDB)
  *    cannot change the result;
  *  - integer outputs are cast to BIGINT/long on BOTH sides so the dumped
  *    parquet types line up;
  *  - float math (cosine etc.) is quantized to integers first so dot products
  *    are exact and order-free (see LlmOps).
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame

  /** A Map literal with duplicate keys silently keeps the LAST entry — a
    * shadowed catalog query never reaches the gate (this happened: two
    * `q_cdc_apply` definitions coexisted for several commits, one
    * invisible). Build every per-file catalog map through this strict
    * constructor so a duplicate key is a construction-time failure, and
    * CatalogSpec exercises it by loading all the maps. */
  def strictMap[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty, s"duplicate catalog keys: ${dups.mkString(", ")}")
    pairs.toMap
  }

  /** Load a harness table. `events.ts` is nanosecond parquet, which Spark
    * only reads as long (spark.sql.legacy.parquet.nanosAsLong) — convert to
    * a microsecond TimestampType here so queries see a timestamp column
    * (DuckDB reads the same file natively as TIMESTAMP_NS). */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** [[table]], widened to machine-width parallelism when the parquet file
    * physically cannot feed it: Spark's scan splits at ROW-GROUP
    * boundaries, and the harness inputs are single-file tables written as
    * ONE row group — so every scan stage (and all the per-row compute
    * whole-stage codegen fuses into it: tokenize explodes, decimal
    * aggregation, scalar projections) runs as one task no matter how many
    * byte-range splits the planner makes (JobBreakdown r12: q1_agg's
    * "32-task" scan+partial-agg job ran 1.8 s = one real task; 31 splits
    * contained no row-group start). This is guide-§2.5 input skew — "one
    * huge unsplittable file: repartition immediately after the read".
    *
    * The widen is gated on the file FOOTER (real row-group count, not a
    * size estimate): it fires only when the file offers fewer row groups
    * than the configured shuffle width AND carries enough bytes for
    * first-stage compute to matter. A cluster-scale table (row groups ≈
    * bytes / 128 MB >> width) never trips the gate, so this is the
    * identity at 100 TB — and a genuinely pathological big single-row-group
    * file (one gzip-style unsplittable blob) correctly pays one shuffle to
    * unlock the cluster. Keyless round-robin keeps the scan's ReadSchema
    * untouched (no partition-key column is forced into the read — the
    * q_wordcount column-pruning pin stays exact); Spark's
    * sort-before-repartition default keeps the assignment deterministic
    * under task retry. Footer metadata is cached per path (file METADATA,
    * like Spark's own file index — never query results). */
  def wideTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = table(s, dir, name)
    // `spark.graft.scan.widen`: auto (footer gate, default) | off — the
    // runtime A/B switch (the dedup-persist-knob discipline).
    if (s.conf.get("spark.graft.scan.widen", "auto") == "off") return df
    val nPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val (groups, bytes) = parquetFooterMeta(s, s"$dir/$name.parquet")
    // 512 KB floor: skips the KB-scale dimension tables (nation/region/
    // customer — no amplifying consumers, the exchange would be pure
    // overhead) while catching documents/embeddings, whose consumers
    // amplify 100-200× (tokenize/shingle/vector explodes), so file bytes
    // understate the compute behind the scan.
    if (groups < nPart && bytes > 512L * 1024)
      df.repartition(nPart, col(WidenKey(name)))
    else df
  }

  /** Hash keys for [[wideTable]]'s spreading repartition. Keyless
    * round-robin would keep ReadSchema untouched but pays Spark's
    * sort-before-repartition (the whole input sorted BINARY on the one
    * real scan task — measured a wash); a hash key costs nothing extra
    * and is chosen per table to MATCH the dominant downstream shuffle key
    * (lineitem/orders join on orderkey, events window/join on user_id,
    * documents dedup-group on text), so consumers keyed the same way
    * reuse the widen exchange instead of adding their own (guide §2.4).
    * `documents` uses `text` — not doc_id — so token consumers' scans
    * stay pruned to the text column alone (the q_wordcount pin). */
  private val WidenKey: Map[String, String] = Map(
    "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey",
    "events" -> "user_id",
    "documents" -> "text",
    "customer" -> "c_custkey",
    "part" -> "p_partkey",
    "supplier" -> "s_suppkey",
    "embeddings" -> "vec_id",
    "nation" -> "n_nationkey",
    "region" -> "r_regionkey")

  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  /** (row groups, file bytes) of a parquet file — footer-only read, cached
    * per path. */
  private def parquetFooterMeta(s: SparkSession, path: String): (Int, Long) =
    footerCache.computeIfAbsent(path, { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val conf = s.sparkContext.hadoopConfiguration
      val fs = hp.getFileSystem(conf)
      val st = fs.getFileStatus(hp)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try (r.getRowGroups.size, st.getLen) finally r.close()
    })

  /** Normalize an `events.ts` column to instant TimestampType whatever the
    * generator wrote: nanosecond INT64 (read as long under
    * spark.sql.legacy.parquet.nanosAsLong) or microseconds with
    * isAdjustedToUTC=false (TIMESTAMP_NTZ — the session is pinned UTC, so
    * the cast is the identity on the underlying micros). Instant functions
    * (unix_micros, window joins against TIMESTAMP) require this; shared by
    * [[table]] and the streaming readers so batch and stream agree at
    * every scale factor. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df
  }

  /** Exact decimal-backed sum of a double expression, returned as double.
    * Decimal arithmetic is exact, so the sum is independent of partitioning /
    * evaluation order and matches DuckDB's decimal sum bit-for-bit. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** DuckDB twin of [[dsum]]. */
  def dsumSql(e: String, scale: Int): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** [[graft.operators.Tokenize.Delim]] escaped for a SQL string literal —
    * single source of the quote-doubling rule for every oracle. */
  val DelimSql: String = graft.operators.Tokenize.Delim.replace("'", "''")

  /** DuckDB: parse `n` hex chars (n ≤ 15, so the value stays in BIGINT)
    * of `hexExpr` starting at 1-based `start` into a BIGINT (mirrors
    * Spark's `conv(substring(h, start, n), 16, 10)` — DuckDB has no
    * base-conversion function, so this is a positional polynomial over
    * the hex digits). */
  def hexLongSql(hexExpr: String, start: Int, n: Int): String = {
    require(n <= 15, s"$n hex digits can overflow BIGINT")
    (0 until n).map { p =>
      val w = 1L << ((n - 1 - p) * 4)
      s"(strpos('0123456789abcdef', substr($hexExpr, ${start + p}, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")
  }

  /** 8-hex-char [[hexLongSql]] — the common fingerprint width. */
  def hex2longSql(hexExpr: String, start: Int): String =
    hexLongSql(hexExpr, start, 8)

  /** Stable per-doc bucket in [0, 100): first 8 md5 hex chars of the KEY
    * (not the row — re-runs and re-partitions agree) as an integer mod
    * 100. Single definition for every sampling/split query; identical in
    * both engines (md5 hex parity). */
  val HashBucketSpark: String =
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"

  /** DuckDB twin of [[HashBucketSpark]]. */
  def hashBucketSql: String =
    s"${hex2longSql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100"

  /** Per-process scratch root for sink round-trip queries: two JVMs (e.g.
    * a Bench run while the driver's Verify is still writing) must not
    * overwrite each other's outputs mid-read. Within one process reruns
    * reuse (overwrite) the same directory, which is safe — evaluation is
    * sequential per session. Creating it also sweeps run-* dirs left by
    * DEAD processes so repeated dev-loop runs don't grow target/tmp
    * unboundedly (live PIDs are left alone). */
  lazy val TmpRoot: String = {
    val root = new java.io.File("/root/repo/target/tmp")
    val mine = s"run-${ProcessHandle.current().pid()}"
    val stale = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("run-") && f.getName != mine)
      .filter { f =>
        f.getName.stripPrefix("run-").toLongOption.forall { pid =>
          val h = ProcessHandle.of(pid)
          !h.isPresent || !h.get().isAlive
        }
      }
    stale.foreach(deleteRecursively)
    s"${root.getPath}/$mine"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** The corpus tokens (doc_id, word) shared by every text query.
    * [[wideTable]]: the explode multiplies rows ~200×, so a single-task
    * scan serializes the whole tokenize pipeline. */
  def corpusToks(s: SparkSession, dir: String): DataFrame =
    graft.operators.Tokenize
      .tokenize(wideTable(s, dir, "documents").select("doc_id", "text"), "text")
      .select("doc_id", "word")
}
