package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-key percentiles (linear interpolation — the `percentile()` /
  * `quantile_cont` contract) WITHOUT buffering any group in memory.
  *
  * Spark's built-in exact `percentile()` is a TypedImperativeAggregate that
  * materializes every value of a group in the final aggregation buffer — a
  * handful of huge groups at 100 TB means billions of doubles on a handful
  * of tasks, an OOM the buffer cannot spill out of. This operator computes
  * the same result as a distributed SELECTION instead:
  *
  *  1. [[Ranks.withinKey]] assigns global within-key ranks via the
  *     range-partitioned two-level scheme — a huge group SPANS partitions,
  *     so no task ever holds more than ~|data|/parts rows;
  *  2. only the two interpolation-neighbor ranks per (key, percentile) are
  *     joined out (broadcast of a tiny rank list), then combined with
  *     Spark's own interpolation formula `(1-frac)·lo + frac·hi`.
  *
  * Every join is an equi join on (key[, rank]); the rank/offset metadata
  * sides join under the `graft.ranks.offsetsBroadcast` policy (default:
  * AQE sizes them at runtime — see [[Ranks]]' high-cardinality guard).
  */
object Percentiles {

  /** @param ps  percentile fractions in [0, 1] (e.g. 0.25, 0.5, 0.75)
    * @param parts range-partition count — sizes the memory bound per task
    * @return one row per (key, p): columns (keyCol, p, q) with q the exact
    *   linear-interpolation percentile of non-null `valCol` values. Keys
    *   with zero non-null values yield no rows (same as `percentile()`
    *   returning null). */
  def exact(df: DataFrame, keyCol: String, valCol: String, ps: Seq[Double],
            parts: Int = 32): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad ps: $ps")
    val data = df.where(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valCol).as("__v"))
    // the two-level rank (range partition + chunk offsets) lives in
    // [[Ranks.withinKey]] — ties on __v get partition-dependent ranks,
    // which is fine HERE because tied values are interchangeable for
    // selection (the value at any tied rank is the same value)
    val ranked0 = Ranks.withinKey(data, "__k", Seq("__v"), parts)
    val ns = data.groupBy("__k").agg(count(lit(1)).as("__n"))
    // Spark's percentile(): position r = p·(n-1) (0-based), neighbors
    // floor(r)/ceil(r), result (1-frac)·lo + frac·hi (exactly lo when
    // frac = 0) — spelled identically here so results bit-match
    val targets = ns.select(col("__k"), col("__n"),
        explode(array(ps.distinct.map(lit): _*)).as("__p"))
      .withColumn("__r", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__r")).cast("long") + 1) // 1-based rank
      .withColumn("__hi", least(col("__lo") + 1, col("__n")))
      .withColumn("__frac", col("__r") - floor(col("__r")))
    val need = targets.select(col("__k"),
      explode(array(col("__lo"), col("__hi"))).as("__rk")).distinct()
    val ranked = ranked0.select(col("__k"), col("rk").as("__rk"), col("__v"))
    // |keys|·|ps|·2 rows — tiny for low-cardinality keys, but subject to
    // the same high-cardinality guard as the rank offsets (Ranks scaladoc)
    val vals = ranked.join(Ranks.maybeBroadcast(need), Seq("__k", "__rk"))
    targets
      .join(vals.select(col("__k"), col("__rk").as("__lo"), col("__v").as("__vlo")),
        Seq("__k", "__lo"))
      .join(vals.select(col("__k"), col("__rk").as("__hi"), col("__v").as("__vhi")),
        Seq("__k", "__hi"))
      .select(col("__k").as(keyCol), col("__p").as("p"),
        when(col("__frac") === 0.0, col("__vlo"))
          .otherwise((lit(1.0) - col("__frac")) * col("__vlo") +
            col("__frac") * col("__vhi")).as("q"))
  }
}
