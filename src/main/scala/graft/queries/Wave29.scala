package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-29 additions: re-identification risk, long-range dependence,
  * and embedding-space geometry —
  *
  *  - q_uniqueness_ladder: fraction of customers unique under 1/2/3
  *    quasi-identifiers in ONE grouping-sets pass — the Sweeney-style
  *    re-identification audit that motivates q_kanon's suppression
  *    (uniqueness climbing the ladder = linkage-attack surface),
  *  - q_hurst: rescaled-range (R/S) Hurst exponent of the daily event
  *    series at block sizes 8/16/32/64 — H ≈ 0.5 is memoryless, H > 0.5
  *    long-range dependent (capacity planning can NOT assume Poisson);
  *    the regression x-side is pre-folded literals,
  *  - q_embedding_norms: norm distribution (rank-selected percentiles),
  *    zero-vector count, and the center-mass ratio ‖mean vec‖ / mean
  *    norm — q_pca_top1's companion: a high ratio means the space is
  *    off-center and cosine needs mean-centering first.
  *
  * Determinism: uniqueness counts are integers; R and the variance
  * argument are EXACT integers (cumulative deviations scaled by the
  * block width), so R/S pays one sqrt + one division per block; norm
  * percentiles are exact integer norm² selections. */
object Wave29 {

  /** R/S block widths (days). */
  private val Widths = Seq(8L, 16L, 32L, 64L)

  /** Pre-folded ln w literals (8 dp) — the regression x-side. The slope
    * is fit over the widths that actually produced full blocks, so a
    * short series (no 64-day block) degrades to a 3-point fit instead
    * of silently mis-normalizing fixed coefficients. */
  private val LnW: Map[Long, String] =
    Widths.map(w => w -> f"${math.log(w.toDouble)}%.8f").toMap

  private def lnWCase(col: String): String =
    "CASE " + Widths.map(w =>
      s"WHEN $col = $w THEN CAST(${LnW(w)} AS DOUBLE)").mkString(" ") + " END"

  val queries: Map[String, Q] = strictMap(

    // UNIQUENESS LADDER: one GROUPING SETS aggregation (single shuffle,
    // partial-agg'd) over (segment) ⊂ (segment, nation) ⊂ (segment,
    // nation, balance-band); level read back from grouping() flags.
    // min_k is the k-anonymity the raw table provides at that level.
    "q_uniqueness_ladder" -> ((s, dir) => {
      table(s, dir, "customer")
        .selectExpr("c_mktsegment AS seg", "c_nationkey AS nat",
          "CAST(floor(c_acctbal / 100) AS BIGINT) AS bal")
        .createOrReplaceTempView("w29_cust")
      s.sql(
        """SELECT
          |  CASE WHEN grouping(nat) = 1 THEN 1
          |       WHEN grouping(bal) = 1 THEN 2 ELSE 3 END AS level,
          |  count(*) AS cnt
          |FROM w29_cust
          |GROUP BY GROUPING SETS ((seg), (seg, nat), (seg, nat, bal))
          |""".stripMargin)
        .groupBy("level")
        .agg(count(lit(1)).as("n_combos"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_unique"),
          min("cnt").as("min_k"), sum("cnt").as("n_rows"))
        .selectExpr("CAST(level AS BIGINT) AS level",
          "CAST(n_combos AS BIGINT) AS n_combos",
          "CAST(n_unique AS BIGINT) AS n_unique",
          "CAST(min_k AS BIGINT) AS min_k",
          "round(CAST(n_unique AS DOUBLE) / n_rows, 6) AS frac_unique")
        .orderBy("level")
    }),

    // HURST: daily counts once (ckpt'd), ×4 width expansion of the tiny
    // daily table, one window pass per (width, block) for the cumulative
    // deviation D_t = w·Σ_{i≤t}c_i − t·S (EXACT integer — the mean never
    // divides), R/S per full block = (maxD − minD)/√(w·Σc² − S²), then
    // H = Σ c_w·ln(mean R/S) with the x-side constants pre-folded.
    "q_hurst" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = table(s, dir, "events")
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("c"))
        .ckpt() // 4 width slices read the same counts
      val widthsDf = s.createDataset(Widths)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("w")
      val wb = daily.crossJoin(broadcast(widthsDf))
        .withColumn("blk", expr("day DIV w"))
      val win = Window.partitionBy("w", "blk").orderBy("day")
      val run = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // D_t depends on t·S which needs S of the WHOLE block — two-pass:
      // aggregate S first, join back, then window the deviations.
      val stats = wb.groupBy("w", "blk")
        .agg(count(lit(1)).as("n"), sum("c").as("ss"),
          sum(expr("c * c")).as("s2"))
        .where(col("n") === col("w")) // full blocks only
      val dev = wb.join(stats, Seq("w", "blk"))
        .withColumn("t", row_number().over(win))
        .withColumn("cum", sum("c").over(run))
        .withColumn("d", expr("w * cum - t * ss"))
        .groupBy("w", "blk")
        .agg(first(col("ss")).as("ss"), first(col("s2")).as("s2"),
          max("d").as("dmx"), min("d").as("dmn"))
        // the variance argument w·Σc² − S² is ~N² in the block's event
        // count, so it wraps int64 once a block passes ~3·10⁹ events —
        // plausible for an 8–64-day block of a 100 TB events table. Both
        // products run 128-bit (Spark DECIMAL ↔ DuckDB HUGEINT, the
        // chi-square discipline) and only the exact difference is cast
        // to DOUBLE for the sqrt.
        .withColumn("rs", expr("round(CAST(greatest(dmx, CAST(0 AS BIGINT))" +
          " - least(dmn, CAST(0 AS BIGINT)) AS DOUBLE)" +
          " / sqrt(CAST(CAST(w AS DECIMAL(19,0)) * s2" +
          " - CAST(ss AS DECIMAL(19,0)) * ss AS DOUBLE)), 8)"))
        .where(expr("CAST(w AS DECIMAL(19,0)) * s2" +
          " - CAST(ss AS DECIMAL(19,0)) * ss > 0"))
      val per = dev.groupBy("w")
        .agg(count(lit(1)).as("n_blocks"), dsum(col("rs"), 8).as("srs"))
        .withColumn("mean_rs", expr("srs / n_blocks"))
        .withColumn("y", expr("round(ln(mean_rs), 8)"))
        .withColumn("x", expr(lnWCase("w")))
        .ckpt() // feeds the slope fit + the output rows
      val h = per.agg(count(lit(1)).as("np"),
        dsum(col("x"), 8).as("sx"), dsum(col("y"), 8).as("sy"),
        dsum(expr("round(x * y, 8)"), 8).as("sxy"),
        dsum(expr("round(x * x, 8)"), 8).as("sxx"))
      per.crossJoin(broadcast(h))
        .selectExpr("CAST(w AS BIGINT) AS w",
          "CAST(n_blocks AS BIGINT) AS n_blocks",
          "round(mean_rs, 6) AS mean_rs",
          "CASE WHEN np < 2 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round((np * sxy - sx * sy)" +
            " / (np * sxx - sx * sx), 6) END AS hurst")
        .orderBy("w")
    }),

    // EMBEDDING NORMS: exact integer norm² per vector (the shared
    // quantization), nearest-rank percentiles by distributed rank
    // selection, and the center-mass ratio from per-dimension exact
    // sums — one explode shuffle + metadata.
    "q_embedding_norms" -> ((s, dir) => {
      val q = LlmOps.quantized(s, dir).select("vec_id", "nq").ckpt()
      val ranked = graft.operators.Ranks
        .withinKey(q.withColumn("k", lit(1)), "k", Seq("nq", "vec_id"))
      val n1 = ranked.agg(max("rk").as("n"))
      val picks = ranked.crossJoin(broadcast(n1))
        .where(expr("rk = greatest(CAST(1 AS BIGINT), (10 * n + 99) DIV 100)" +
          " OR rk = greatest(CAST(1 AS BIGINT), (50 * n + 99) DIV 100)" +
          " OR rk = greatest(CAST(1 AS BIGINT), (90 * n + 99) DIV 100)"))
        .agg(max(expr("CASE WHEN rk = greatest(CAST(1 AS BIGINT)," +
          " (10 * n + 99) DIV 100) THEN nq END")).as("q10"),
          max(expr("CASE WHEN rk = greatest(CAST(1 AS BIGINT)," +
            " (50 * n + 99) DIV 100) THEN nq END")).as("q50"),
          max(expr("CASE WHEN rk = greatest(CAST(1 AS BIGINT)," +
            " (90 * n + 99) DIV 100) THEN nq END")).as("q90"))
      val base = q.agg(count(lit(1)).as("n"),
        sum(when(col("nq") === 0, 1L).otherwise(0L)).as("n_zero"),
        dsum(expr("round(sqrt(CAST(nq AS DOUBLE)), 8)"), 8).as("snorm"))
      val dims = table(s, dir, "embeddings")
        .select(posexplode(expr(LlmOps.QuantSpark)))
        .groupBy("pos").agg(sum("col").as("sd"))
        .agg(sum(expr("sd * sd")).as("ssq"))
      base.crossJoin(broadcast(picks)).crossJoin(broadcast(dims))
        .selectExpr("CAST(n AS BIGINT) AS n_vecs",
          "CAST(n_zero AS BIGINT) AS n_zero",
          "round(sqrt(CAST(q10 AS DOUBLE)) / 1000, 6) AS p10_norm",
          "round(sqrt(CAST(q50 AS DOUBLE)) / 1000, 6) AS p50_norm",
          "round(sqrt(CAST(q90 AS DOUBLE)) / 1000, 6) AS p90_norm",
          "round(snorm / n / 1000, 6) AS mean_norm",
          "round(sqrt(CAST(ssq AS DOUBLE)) / n / (snorm / n), 6)" +
            " AS center_mass_ratio")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_uniqueness_ladder" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS seg, c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal
        |  FROM customer
        |),
        |g AS (
        |  SELECT CASE WHEN grouping(nat) = 1 THEN 1
        |              WHEN grouping(bal) = 1 THEN 2 ELSE 3 END AS level,
        |    count(*) AS cnt
        |  FROM c
        |  GROUP BY GROUPING SETS ((seg), (seg, nat), (seg, nat, bal))
        |)
        |SELECT CAST(level AS BIGINT) AS level,
        |  CAST(count(*) AS BIGINT) AS n_combos,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  CAST(min(cnt) AS BIGINT) AS min_k,
        |  round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / sum(cnt), 6) AS frac_unique
        |FROM g GROUP BY level ORDER BY level""".stripMargin,

    "q_hurst" -> {
      val widthRows = Widths.map(w => s"SELECT CAST($w AS BIGINT) AS w")
        .mkString("\n  UNION ALL ")
      s"""WITH daily AS MATERIALIZED (
         |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
         |  FROM events GROUP BY 1
         |),
         |widths AS ($widthRows),
         |wb AS MATERIALIZED (
         |  SELECT w, day, c, day // w AS blk
         |  FROM daily CROSS JOIN widths
         |),
         |stats AS (
         |  SELECT w, blk, count(*) AS n, CAST(sum(c) AS BIGINT) AS ss,
         |    CAST(sum(c * c) AS BIGINT) AS s2
         |  FROM wb GROUP BY w, blk
         |  HAVING count(*) = w
         |),
         |dev AS (
         |  SELECT wb.w, wb.blk, ss, s2,
         |    wb.w * sum(c) OVER (PARTITION BY wb.w, wb.blk ORDER BY day)
         |      - row_number() OVER (PARTITION BY wb.w, wb.blk ORDER BY day)
         |        * ss AS d
         |  FROM wb JOIN stats ON stats.w = wb.w AND stats.blk = wb.blk
         |),
         |rsb AS (
         |  SELECT w, blk,
         |    round(CAST(greatest(max(d), CAST(0 AS BIGINT))
         |      - least(min(d), CAST(0 AS BIGINT)) AS DOUBLE)
         |      / sqrt(CAST(CAST(w AS HUGEINT) * max(s2)
         |        - CAST(max(ss) AS HUGEINT) * max(ss) AS DOUBLE)), 8)
         |      AS rs
         |  FROM dev GROUP BY w, blk, ss, s2
         |  HAVING CAST(w AS HUGEINT) * max(s2)
         |    - CAST(max(ss) AS HUGEINT) * max(ss) > 0
         |),
         |per AS (
         |  SELECT w, count(*) AS n_blocks,
         |    ${dsumSql("rs", 8)} / count(*) AS mean_rs
         |  FROM rsb GROUP BY w
         |),
         |py AS (
         |  SELECT w, n_blocks, mean_rs,
         |    round(ln(mean_rs), 8) AS y, ${lnWCase("w")} AS x
         |  FROM per
         |),
         |h AS (
         |  SELECT count(*) AS np, ${dsumSql("x", 8)} AS sx,
         |    ${dsumSql("y", 8)} AS sy,
         |    ${dsumSql("round(x * y, 8)", 8)} AS sxy,
         |    ${dsumSql("round(x * x, 8)", 8)} AS sxx
         |  FROM py
         |)
         |SELECT CAST(w AS BIGINT) AS w,
         |  CAST(n_blocks AS BIGINT) AS n_blocks,
         |  round(mean_rs, 6) AS mean_rs,
         |  CASE WHEN np < 2 THEN CAST(NULL AS DOUBLE)
         |       ELSE round((np * sxy - sx * sy)
         |       / (np * sxx - sx * sx), 6) END AS hurst
         |FROM py CROSS JOIN h ORDER BY w""".stripMargin
    },

    "q_embedding_norms" ->
      s"""WITH ${LlmOps.QuantizedNormSql},
         |r AS (
         |  SELECT nq, CAST(row_number() OVER (ORDER BY nq, vec_id)
         |    AS BIGINT) AS rk, CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM qn
         |),
         |picks AS (
         |  SELECT
         |    max(CASE WHEN rk = greatest(CAST(1 AS BIGINT),
         |      (10 * n + 99) // 100) THEN nq END) AS q10,
         |    max(CASE WHEN rk = greatest(CAST(1 AS BIGINT),
         |      (50 * n + 99) // 100) THEN nq END) AS q50,
         |    max(CASE WHEN rk = greatest(CAST(1 AS BIGINT),
         |      (90 * n + 99) // 100) THEN nq END) AS q90
         |  FROM r
         |  WHERE rk = greatest(CAST(1 AS BIGINT), (10 * n + 99) // 100)
         |     OR rk = greatest(CAST(1 AS BIGINT), (50 * n + 99) // 100)
         |     OR rk = greatest(CAST(1 AS BIGINT), (90 * n + 99) // 100)
         |),
         |base AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN nq = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_zero,
         |    ${dsumSql("round(sqrt(CAST(nq AS DOUBLE)), 8)", 8)} AS snorm
         |  FROM qn
         |),
         |dims AS (
         |  SELECT CAST(sum(sd * sd) AS BIGINT) AS ssq FROM (
         |    SELECT i, sum(q) AS sd
         |    FROM (SELECT vec_id, i,
         |            ${LlmOps.quantSqlElem("embedding[i]")} AS q
         |          FROM (SELECT vec_id, embedding,
         |                  unnest(generate_series(1, len(embedding))) AS i
         |                FROM embeddings))
         |    GROUP BY i)
         |)
         |SELECT CAST(n AS BIGINT) AS n_vecs,
         |  CAST(n_zero AS BIGINT) AS n_zero,
         |  round(sqrt(CAST(q10 AS DOUBLE)) / 1000, 6) AS p10_norm,
         |  round(sqrt(CAST(q50 AS DOUBLE)) / 1000, 6) AS p50_norm,
         |  round(sqrt(CAST(q90 AS DOUBLE)) / 1000, 6) AS p90_norm,
         |  round(snorm / n / 1000, 6) AS mean_norm,
         |  round(sqrt(CAST(ssq AS DOUBLE)) / n / (snorm / n), 6)
         |    AS center_mass_ratio
         |FROM base CROSS JOIN picks CROSS JOIN dims""".stripMargin,
  )
}
